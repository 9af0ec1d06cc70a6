#!/usr/bin/env python3
"""Extract assertFunction(...) SQL vectors from the reference's operator
test files for SqlProbe replay (the round-13 KAT campaign, hardened in
round 14 so multiline Java string concatenation can no longer truncate a
vector into the artifact bucket).

The r13 extractor was a line regex: any vector whose SQL spanned lines
(`"SELECT foo(" +\n  "...")` was truncated at the line break and showed
up as a parse-error "artifact", where a real gap could hide. This
version balanced-paren-scans the whole call and joins adjacent Java
string literals across `+` and newlines, so the only residuals left are
vectors whose FIRST argument is not a pure string-literal expression
(interpolated via variables/helpers — counted and named, never silently
dropped).

Usage:
    python3 tools/extract_kats.py <Test*.java> [...] > /tmp/kats.sql
    # then: sbt 'runMain graft.tools.SqlProbe @/tmp/kats.sql'

Output: one SQL statement per line, `;;`-separated blocks as SqlProbe
expects, prefixed with the dialect SET. Stats go to stderr.
"""
import re
import sys

CALL = re.compile(r"\b(?:assertFunction|assertDecimalFunction)\s*\(")

# a Java string literal (double-quoted, backslash escapes)
STR_LIT = re.compile(r'"((?:[^"\\]|\\.)*)"')


def java_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            mapped = {"n": "\n", "t": "\t", "r": "\r", '"': '"',
                      "'": "'", "\\": "\\"}.get(n)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
            if n == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n.isdigit():
                # Java octal escape (\0 .. \377)
                j = i + 1
                while j < len(s) and j < i + 4 and s[j].isdigit() and \
                        int(s[i + 1:j + 1], 8) <= 0o377:
                    j += 1
                out.append(chr(int(s[i + 1:j], 8)))
                i = j
                continue
        out.append(c)
        i += 1
    # Java 🚀-style escapes decode to a surrogate PAIR of code
    # units; combine them into the real code point (a lone surrogate
    # would make the output unencodable as UTF-8)
    return ("".join(out).encode("utf-16", "surrogatepass")
            .decode("utf-16", "replace"))


def balanced_args(text: str, open_idx: int) -> str:
    """Text between the '(' at open_idx and its matching ')', honoring
    Java string/char literals and both comment styles."""
    depth = 0
    i = open_idx
    n = len(text)
    while i < n:
        c = text[i]
        if c == '"':
            i += 1
            while i < n and text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        elif c == "'":
            i += 1
            while i < n and text[i] != "'":
                i += 2 if text[i] == "\\" else 1
        elif c == "/" and i + 1 < n and text[i + 1] == "/":
            while i < n and text[i] != "\n":
                i += 1
            continue
        elif c == "/" and i + 1 < n and text[i + 1] == "*":
            i = text.find("*/", i + 2)
            if i < 0:
                return ""
            i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return text[open_idx + 1:i]
        i += 1
    return ""


def first_arg(args: str) -> str:
    """The first top-level-comma-delimited argument."""
    depth = 0
    i = 0
    n = len(args)
    while i < n:
        c = args[i]
        if c == '"':
            i += 1
            while i < n and args[i] != '"':
                i += 2 if args[i] == "\\" else 1
        elif c == "'":
            i += 1
            while i < n and args[i] != "'":
                i += 2 if args[i] == "\\" else 1
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            return args[:i]
        i += 1
    return args


def literal_only_sql(expr: str):
    """If expr is string literals joined by '+' (and whitespace), return
    the joined unescaped SQL; else None (a named residual)."""
    rest = expr.strip()
    parts = []
    while rest:
        m = STR_LIT.match(rest)
        if not m:
            return None
        parts.append(java_unescape(m.group(1)))
        rest = rest[m.end():].lstrip()
        if not rest:
            break
        if rest[0] != "+":
            return None
        rest = rest[1:].lstrip()
    return "".join(parts) if parts else None


def split_args(args: str):
    """All top-level-comma-delimited arguments."""
    out = []
    depth = 0
    start = 0
    i = 0
    n = len(args)
    while i < n:
        c = args[i]
        if c == '"':
            i += 1
            while i < n and args[i] != '"':
                i += 2 if args[i] == "\\" else 1
        elif c == "'":
            i += 1
            while i < n and args[i] != "'":
                i += 2 if args[i] == "\\" else 1
        elif c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            out.append(args[start:i])
            start = i + 1
        i += 1
    out.append(args[start:])
    return [a.strip() for a in out]


NUM_LIT = re.compile(
    r"^[+-]?(?:\d[\d_]*\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)[LlFfDd]?$")
CAST_PREFIX = re.compile(r"^\(\s*(?:long|int|short|byte|double|float)\s*\)\s*")


def literal_expected(expr: str):
    """(kind, value) when the expected-value argument is a plain Java
    literal this harness can compare: a string (possibly concatenated),
    a number, true/false, or null. None otherwise."""
    e = CAST_PREFIX.sub("", expr.strip())
    if e == "null":
        return ("null", "")
    if e in ("true", "false"):
        return ("bool", e)
    s = literal_only_sql(e)
    if s is not None and e.lstrip().startswith('"'):
        return ("str", s)
    if NUM_LIT.match(e):
        v = e.replace("_", "")
        if v[-1] in "LlFfDd" and not v[-1].isdigit():
            v = v[:-1]
        kind = "num" if ("." in v or "e" in v or "E" in v) else "int"
        return (kind, v)
    return None


def main():
    argv = sys.argv[1:]
    values_path = None
    if "--values" in argv:
        k = argv.index("--values")
        values_path = argv[k + 1]
        argv = argv[:k] + argv[k + 2:]
    stmts = []
    value_rows = []
    for path in argv:
        text = open(path).read()
        total = ok = interp = 0
        for m in CALL.finditer(text):
            total += 1
            args = balanced_args(text, m.end() - 1)
            sql = literal_only_sql(first_arg(args))
            if sql is None:
                interp += 1
                line = text.count("\n", 0, m.start()) + 1
                snippet = " ".join(first_arg(args).split())[:90]
                print(f"RESIDUAL interpolated {path}:{line}: {snippet}",
                      file=sys.stderr)
                continue
            ok += 1
            stmt = ("SELECT " + sql if not
                    sql.lstrip().upper().startswith(("SELECT", "VALUES",
                                                     "WITH")) else sql)
            stmts.append(stmt)
            # value-assertion mode: keep (sql, kind, expected) when the
            # LAST argument is a plain literal (assertFunction's shape is
            # (sql, type, expected); assertDecimalFunction likewise)
            if values_path is not None:
                parts = split_args(args)
                if len(parts) >= 3:
                    lit = literal_expected(parts[-1])
                    if lit is not None:
                        esc = stmt.replace("\\", "\\\\") \
                            .replace("\t", "\\t").replace("\n", "\\n")
                        val = lit[1].replace("\\", "\\\\") \
                            .replace("\t", "\\t").replace("\n", "\\n")
                        value_rows.append(f"{esc}\t{lit[0]}\t{val}")
        print(f"{path}: {total} vectors, {ok} extracted, "
              f"{interp} interpolated residual", file=sys.stderr)
    if values_path is not None:
        with open(values_path, "w") as f:
            f.write("\n".join(value_rows) + ("\n" if value_rows else ""))
        print(f"values: {len(value_rows)} comparable vectors -> {values_path}",
              file=sys.stderr)
    print("SET spark.graft.prestoOperators=true")
    for s in stmts:
        print(";;")
        print(s)


if __name__ == "__main__":
    main()
