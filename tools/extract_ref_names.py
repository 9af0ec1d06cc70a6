#!/usr/bin/env python3
"""Scan the reference's presto-main for every user-callable function name:
@ScalarFunction / @AggregationFunction / @WindowFunction annotation values,
singular and braced alias= lists, and (for bare @ScalarFunction) the
annotated method name converted camelToSnake exactly as the reference's
ScalarImplementationHeader.java:69-71 does. Internal planner spellings
(array_constructor, like_pattern, $-prefixed) are excluded — users reach
them through ARRAY[]/LIKE syntax, not by name. Output: one name per line,
feed to `sbt "runMain graft.tools.CheckNames <file>"`.

    python3 tools/extract_ref_names.py /tmp/ref_all_names.txt
"""
import re
import pathlib
import sys

ROOT = pathlib.Path('/root/reference/presto-main/src/main/java')
JUNK = {'array_constructor', 'like_pattern', 'source',
        'scalar_header_and_methods', 'find_scalars_in_function_definition_class',
        'parse_parametric_scalar'}


def snake(n):
    return re.sub(r'(?<=[a-z0-9])([A-Z])',
                  lambda m: '_' + m.group(1).lower(), n).lower()


def main(out_path):
    names = set()
    for f in ROOT.rglob('*.java'):
        src = f.read_text(errors='replace')
        for kind in ('ScalarFunction', 'AggregationFunction', 'WindowFunction'):
            for m in re.finditer(r'@' + kind + r'\s*(\(([^)]*)\))?', src):
                args = m.group(2) or ''
                nm = None
                vm = re.search(r'value\s*=\s*"([^"]+)"', args)
                if vm:
                    nm = vm.group(1)
                else:
                    fm = re.match(r'\s*"([^"]+)"', args)
                    if fm:
                        nm = fm.group(1)
                found = set()
                if nm:
                    found.add(nm)
                for am in re.finditer(r'alias\s*=\s*(\{[^}]*\}|"[^"]+")', args):
                    found |= set(re.findall(r'"([^"]+)"', am.group(1)))
                if not nm and kind == 'ScalarFunction':
                    rest = src[m.end():m.end() + 600]
                    mm = re.search(r'(?:[\w\.<>\[\]?]+\s+)(\w+)\s*\(', rest)
                    if mm and not re.match(r'(if|for|while|class)$', mm.group(1)):
                        found.add(snake(mm.group(1)))
                names |= found
    names = {n for n in names if n not in JUNK and not n.startswith('$')}
    pathlib.Path(out_path).write_text('\n'.join(sorted(names)) + '\n')
    print(f'{len(names)} names -> {out_path}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/ref_all_names.txt')
