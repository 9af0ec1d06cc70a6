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


EXPECTED_EXC = re.compile(r"@Test\s*\(")


def expected_exception_spans(text: str):
    """Body spans of methods annotated @Test(expectedExceptions=...).
    assertFunction literals inside such methods never validate — the
    exception is the contract — so they must not become replay
    statements or value vectors (ADVICE r14: the split_part(...,0)
    vector was exactly this false positive)."""
    spans = []
    for m in EXPECTED_EXC.finditer(text):
        ann = balanced_args(text, m.end() - 1)
        if "expectedExceptions" not in ann:
            continue
        # skip past the annotation's closing ')' then find the method
        # body '{' (after the signature's balanced parens)
        i = m.end() - 1
        depth = 0
        n = len(text)
        while i < n:
            c = text[i]
            if c == '"':
                i += 1
                while i < n and text[i] != '"':
                    i += 2 if text[i] == "\\" else 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            i += 1
        # signature: run to the first '{' (skipping throws-clause etc.,
        # honoring any parenthesized parameter list)
        while i < n and text[i] != "{":
            if text[i] == "(":
                end = balanced_args(text, i)
                i += len(end) + 2
            else:
                i += 1
        if i >= n:
            continue
        body_start = i
        depth = 0
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
                    break
                i += 1
            elif c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    spans.append((body_start, i))
                    break
            i += 1
    return spans


NUM_LIT = re.compile(
    r"^[+-]?(?:\d[\d_]*\.?\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?)[LlFfDd]?$")
CAST_PREFIX = re.compile(r"^\(\s*(?:long|int|short|byte|double|float)\s*\)\s*")

# ---- round-15 value-gate widening: constant-fold COMPUTED expecteds ----
# The r14 literal sweep found 8 real divergences the error gate missed;
# the computed-expected tail (lists, maps, literal arithmetic, infinity
# constants, Math.* on literals, decimal()) is where the next ones hide
# (VERDICT r14 ask #5). Folded vectors carry kind 'json' (recursive
# structure; maps as {"__kat_map__": [[k,v],...]}) or 'dec'; KatCheck
# compares structurally / by scale-exact decimal text.

INF_CONSTS = {
    "POSITIVE_INFINITY": float("inf"), "NEGATIVE_INFINITY": float("-inf"),
    "Double.POSITIVE_INFINITY": float("inf"),
    "Double.NEGATIVE_INFINITY": float("-inf"),
    "Float.POSITIVE_INFINITY": float("inf"),
    "Float.NEGATIVE_INFINITY": float("-inf"),
    "NaN": float("nan"), "Double.NaN": float("nan"),
    "Float.NaN": float("nan"),
    "Integer.MAX_VALUE": 2147483647, "Integer.MIN_VALUE": -2147483648,
    "Long.MAX_VALUE": 9223372036854775807,
    "Long.MIN_VALUE": -9223372036854775808,
    "Math.PI": __import__("math").pi, "Math.E": __import__("math").e,
}

MATH_FNS = {
    "Math.abs": abs, "Math.sqrt": lambda x: x ** 0.5,
    "Math.cbrt": lambda x: __import__("math").copysign(abs(x) ** (1 / 3), x),
    "Math.acos": __import__("math").acos, "Math.asin": __import__("math").asin,
    "Math.atan": __import__("math").atan, "Math.cos": __import__("math").cos,
    "Math.sin": __import__("math").sin, "Math.tan": __import__("math").tan,
    "Math.cosh": __import__("math").cosh, "Math.sinh": __import__("math").sinh,
    "Math.tanh": __import__("math").tanh, "Math.exp": __import__("math").exp,
    "Math.log": __import__("math").log, "Math.log10": __import__("math").log10,
    "Math.floor": __import__("math").floor, "Math.ceil": lambda x: float(__import__("math").ceil(x)),
    "Math.toRadians": __import__("math").radians,
    "Math.toDegrees": __import__("math").degrees,
    "Math.pow": __import__("math").pow, "Math.atan2": __import__("math").atan2,
}

LIST_HEADS = ("ImmutableList.of", "asList", "Arrays.asList", "list",
              "Collections.singletonList", "singletonList",
              "Lists.newArrayList")

_MARK = object()  # fold failure sentinel (None is a valid folded null)


def _num_value(e):
    """Numeric literal (with Java suffix/underscores) -> int or float."""
    v = e.replace("_", "")
    is_float = False
    if v and v[-1] in "LlFfDd" and not v[-1].isdigit():
        is_float = v[-1] in "FfDd"
        v = v[:-1]
    if "." in v or "e" in v.lower():
        is_float = True
    return float(v) if is_float else int(v)


def fold_scalar(expr):
    """Java scalar expected expression -> python value, or _MARK."""
    e = CAST_PREFIX.sub("", expr.strip())
    if e == "null":
        return None
    if e == "true":
        return True
    if e == "false":
        return False
    if e in INF_CONSTS:
        return INF_CONSTS[e]
    if NUM_LIT.match(e):
        try:
            return _num_value(e)
        except ValueError:
            return _MARK
    if e.lstrip().startswith('"'):
        s = literal_only_sql(e)
        return s if s is not None else _MARK
    # java cast prefixes on object scalars: (Object) null etc.
    m_obj = re.match(r"^\(\s*Object\s*\)\s*(.*)$", e)
    if m_obj:
        return fold_scalar(m_obj.group(1))
    # test-helper folds (r15 second wave): padRight pads with spaces to
    # n (TestStringFunctions.padRight:72-75); utf8Slice of a literal or
    # String.valueOf(literal) is the text itself
    m_pad = re.match(r"^padRight\s*\(", e)
    if m_pad and e.endswith(")"):
        args = split_args(balanced_args(e, e.index("(")))
        if len(args) == 2:
            sv = fold_scalar(args[0])
            nv = fold_scalar(args[1])
            if isinstance(sv, str) and isinstance(nv, int):
                return sv.ljust(nv)
    m_u8 = re.match(r"^utf8Slice\s*\(", e)
    if m_u8 and e.endswith(")"):
        inner = balanced_args(e, e.index("(")).strip()
        mv = re.match(r"^String\.valueOf\s*\((.*)\)$", inner)
        if mv:
            v = fold_scalar(mv.group(1))
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (int, str)):
                return str(v)
            if isinstance(v, float):
                return repr(v)
        else:
            v = fold_scalar(inner)
            if isinstance(v, str):
                return v
    folded = fold_arith(e)
    if folded is not _MARK:
        return folded
    m = re.match(r"^(Math\.\w+)\s*\(", e)
    if m and m.group(1) in MATH_FNS and e.endswith(")"):
        inner = balanced_args(e, e.index("("))
        argvals = [fold_scalar(a) for a in split_args(inner)]
        if all(isinstance(a, (int, float)) and not isinstance(a, bool)
               for a in argvals):
            try:
                return float(MATH_FNS[m.group(1)](*argvals))
            except (ValueError, OverflowError, ZeroDivisionError):
                return _MARK
    return _MARK


ARITH_SAFE = re.compile(r"^[\d_.eE\s+\-*()LlFfDd]+$")


def fold_arith(e):
    """Literal +,-,* arithmetic (Java semantics are value-identical for
    these ops at the magnitudes the tests use; '/' is skipped — Java int
    division truncates and the tests' intent is ambiguous in text)."""
    if not ARITH_SAFE.match(e) or not re.search(r"[+\-*]", e.strip()[1:]):
        return _MARK
    # float32 arithmetic does NOT fold: Java computes `-17.34f + -22.891f`
    # in float space and python would fold it in double space — the two
    # differ in the low bits and the comparator is ULP-exact (r15)
    if re.search(r"\d[Ff]\b", e):
        return _MARK
    # strip Java numeric suffixes; track float-ness
    is_float = "." in e or re.search(r"\d[Dd]\b", e) is not None
    cleaned = re.sub(r"(\d)[LlDd]\b", r"\1", e).replace("_", "")
    if re.search(r"[a-df-zA-DF-Z]", cleaned):
        return _MARK
    try:
        v = eval(cleaned, {"__builtins__": {}}, {})  # literals-only by regex
    except Exception:
        return _MARK
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v) if is_float and not isinstance(v, float) else v
    return _MARK


def fold_structure(expr):
    """Recursive fold: scalars, list builders, ImmutableMap.of. Returns a
    python JSON-able value (maps -> {"__kat_map__": [[k,v],...]}), or
    _MARK when any part is not foldable."""
    e = expr.strip()
    for head in LIST_HEADS:
        if e.startswith(head + "(") or re.match(
                re.escape(head) + r"\s*\(", e):
            op = e.index("(")
            if not e.endswith(")"):
                return _MARK
            inner = balanced_args(e, op)
            if inner.strip() == "":
                return []
            elems = [fold_structure(a) for a in split_args(inner)]
            return _MARK if any(x is _MARK for x in elems) else elems
    if re.match(r"^ImmutableMap\.(of|builder)\s*\(", e):
        if not e.startswith("ImmutableMap.of"):
            return _MARK  # builder chains: not folded (rare)
        op = e.index("(")
        if not e.endswith(")"):
            return _MARK
        inner = balanced_args(e, op)
        if inner.strip() == "":
            return {"__kat_map__": []}
        parts = [fold_structure(a) for a in split_args(inner)]
        if any(x is _MARK for x in parts) or len(parts) % 2 != 0:
            return _MARK
        return {"__kat_map__": [[parts[i], parts[i + 1]]
                                for i in range(0, len(parts), 2)]}
    return fold_scalar(e)


def render_json(v):
    """JSON text with Java-compatible specials (Infinity/NaN emitted as
    strings tagged for the comparator; plain floats via repr which is
    numerically exact)."""
    import math as _m
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') \
            .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r") + '"'
    if isinstance(v, float):
        if _m.isnan(v):
            return '{"__kat_num__":"NaN"}'
        if _m.isinf(v):
            return '{"__kat_num__":"%sInfinity"}' % ("-" if v < 0 else "")
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(render_json(x) for x in v) + "]"
    if isinstance(v, dict):
        return '{"__kat_map__":[' + ",".join(
            "[%s,%s]" % (render_json(k), render_json(w))
            for k, w in v["__kat_map__"]) + "]}"
    raise ValueError(str(v))


DEC_CALL = re.compile(r'^(?:decimal|SqlDecimal\.of)\s*\(\s*"((?:[^"\\]|\\.)*)"\s*\)$')
BIN_CALL = re.compile(r"^(sqlVarbinaryHex|sqlVarbinary|varbinary|sqlVarbinaryFromHex)\s*\(")


def computed_expected(expr):
    """(kind, rendered) for a foldable COMPUTED expected, else None.
    Scalars fold into the existing literal kinds so the comparator's
    numeric rules apply; structures into 'json'; decimal() into 'dec'."""
    e = expr.strip()
    mb = BIN_CALL.match(e)
    if mb and e.endswith(")"):
        # binary expecteds compare as lowercase hex (kind 'bin'):
        # sqlVarbinary("s")/varbinary("s") are the UTF-8 bytes,
        # sqlVarbinaryHex("AB") decodes base16
        inner = balanced_args(e, e.index("(")).strip()
        args = split_args(inner)
        vals = [fold_scalar(a) for a in args]
        if all(isinstance(v, str) for v in vals):
            import binascii
            try:
                if mb.group(1) in ("sqlVarbinaryHex", "sqlVarbinaryFromHex"):
                    raw = binascii.unhexlify("".join(vals).replace(" ", ""))
                else:
                    raw = "".join(vals).encode("utf-8")
                return ("bin", raw.hex())
            except binascii.Error:
                return None
    m = DEC_CALL.match(e)
    if m:
        # canonicalize like SqlDecimal.toString (Decimals.toString of
        # unscaled+scale): leading zeros drop, the literal's scale stays
        # ('0000.00' -> '0.00')
        import decimal as _d
        try:
            v = _d.Decimal(java_unescape(m.group(1)))
            if v == 0:
                v = abs(v)  # BigDecimal drops the sign of a zero
            return ("dec", str(v))
        except _d.InvalidOperation:
            return ("dec", java_unescape(m.group(1)))
    v = fold_structure(e)
    if v is _MARK:
        return None
    import math as _m
    if isinstance(v, (list, dict)):
        return ("json", render_json(v))
    if v is None:
        return ("null", "")
    if v is True or v is False:
        return ("bool", "true" if v else "false")
    if isinstance(v, float):
        if _m.isnan(v):
            return ("num", "NaN")
        if _m.isinf(v):
            return ("num", "-Infinity" if v < 0 else "Infinity")
        return ("num", repr(v))
    if isinstance(v, int):
        return ("int", str(v))
    if isinstance(v, str):
        return ("str", v)
    return None


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
    folded = 0
    unchecked = 0
    for path in argv:
        text = open(path).read()
        exc_spans = expected_exception_spans(text)
        total = ok = interp = exc_skipped = 0
        for m in CALL.finditer(text):
            total += 1
            if any(a <= m.start() < b for a, b in exc_spans):
                exc_skipped += 1
                continue
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
                    if lit is None:
                        lit = computed_expected(parts[-1])
                        if lit is None:
                            unchecked += 1
                        else:
                            folded += 1
                    if lit is not None:
                        esc = stmt.replace("\\", "\\\\") \
                            .replace("\t", "\\t").replace("\n", "\\n")
                        val = lit[1].replace("\\", "\\\\") \
                            .replace("\t", "\\t").replace("\n", "\\n")
                        value_rows.append(f"{esc}\t{lit[0]}\t{val}")
        print(f"{path}: {total} vectors, {ok} extracted, "
              f"{interp} interpolated residual, "
              f"{exc_skipped} expectedExceptions-skipped", file=sys.stderr)
    if values_path is not None:
        with open(values_path, "w") as f:
            f.write("\n".join(value_rows) + ("\n" if value_rows else ""))
        print(f"values: {len(value_rows)} comparable vectors "
              f"({folded} constant-folded from computed expecteds; "
              f"{unchecked} still unchecked) -> {values_path}",
              file=sys.stderr)
    print("SET spark.graft.prestoOperators=true")
    for s in stmts:
        print(";;")
        print(s)


if __name__ == "__main__":
    main()
