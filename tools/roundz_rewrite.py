#!/usr/bin/env python3
"""One-shot helper for the r8 signed-zero sweep: rewrite a specific
`round(<expr>, 6)` occurrence (balanced-paren parsed) into the
quantize-then-divide form that makes the zero sign deterministic in both
engines (see Num.roundZ / Num.roundZSql in Core.scala).

Usage: roundz_rewrite.py <file> <line> <mode>
  mode 'sql'   : round(X, 6)  ->  (CAST(round((X) * 1e6) AS BIGINT) / 1e6)
  mode 'scala' : round(X, 6)  ->  Num.roundZ(X, 6)
Finds the FIRST `round(` at or after the 1-based <line>.
"""
import sys


def find_balanced(src, start):
    """start points at the '(' after round; return index of matching ')'."""
    depth = 0
    i = start
    while i < len(src):
        if src[i] == '(':
            depth += 1
        elif src[i] == ')':
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise SystemExit("unbalanced parens")


def main():
    path, line_no, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    src = open(path).read()
    lines = src.split('\n')
    off = sum(len(l) + 1 for l in lines[: line_no - 1])
    idx = src.find('round(', off)
    if idx < 0:
        raise SystemExit(f"no round( at/after line {line_no}")
    # skip Num.roundZ / already-converted occurrences
    close = find_balanced(src, idx + len('round'))
    inner = src[idx + len('round('): close]
    # split off trailing ", 6" (scale arg) at depth 0
    depth = 0
    split_at = None
    for i, ch in enumerate(inner):
        if ch == '(':
            depth += 1
        elif ch == ')':
            depth -= 1
        elif ch == ',' and depth == 0:
            split_at = i
    if split_at is None:
        raise SystemExit("round() has no scale arg here — wrong site?")
    expr, scale = inner[:split_at], inner[split_at + 1:].strip()
    sc = scale.replace("lit(", "").replace(")", "")
    if not sc.isdigit():
        raise SystemExit(f"scale is {scale!r}, expected an int — wrong site?")
    if mode == 'sql':
        new = f"(CAST(round(({expr.strip()}) * 1e{sc}) AS BIGINT) / 1e{sc})"
    else:
        new = f"Num.roundZ({expr.strip()}, {sc})"
    out = src[:idx] + new + src[close + 1:]
    open(path, 'w').write(out)
    print(f"{path}:{line_no}: rewrote round(..., {scale}) [{mode}]")


if __name__ == '__main__':
    main()
