#!/usr/bin/env python3
"""One-shot migration: round(EXPR, 6|4) -> u6/u4 (Scala) or the
floor(x*10^s + 0.5)/10^s expansion (SQL strings in SparkEntry.scala).

Rationale (VERDICT r6 item 2): decimal round() on an identical double can
land on opposite sides of the half boundary per engine (Spark rounds the
shortest-decimal repr via BigDecimal HALF_UP; DuckDB rounds the exact
binary value). floor(x*1e6 + 0.5)/1e6 is a fixed IEEE op sequence both
engines share, so it can never flap. Scale-3 cosine and scale-12 decimal
pre-rounds are handled separately (matched kernel/oracle pairs).
"""
import re
import sys

SCALA_FILES = [
    "src/main/scala/graft/operators/Analytics.scala",
    "src/main/scala/graft/operators/Pipeline.scala",
    "src/main/scala/graft/operators/Similarity.scala",
    "src/main/scala/graft/operators/Dedup.scala",
    "src/main/scala/graft/operators/Ivf.scala",
]
SQL_FILE = "src/main/scala/graft/SparkEntry.scala"


def find_balanced(s, start):
    """s[start] == '('; return index of matching ')'. Tracks quotes."""
    depth = 0
    i = start
    in_str = False
    while i < len(s):
        c = s[i]
        if in_str:
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError(f"unbalanced paren at {start}")


def top_level_rsplit_comma(s):
    """Split off the last top-level comma: 'a, b' -> ('a', ' b')."""
    depth = 0
    in_str = False
    for i in range(len(s) - 1, -1, -1):
        c = s[i]
        if in_str:
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == ')':
            depth += 1
        elif c == '(':
            depth -= 1
        elif c == ',' and depth == 0:
            return s[:i], s[i + 1:]
    return None, None


def in_comment(text, idx):
    """True if the line containing idx is a scaladoc/line comment, or the
    match sits after a // on its line."""
    bol = text.rfind("\n", 0, idx) + 1
    line = text[bol:idx]
    stripped = text[bol:text.find("\n", bol)].lstrip()
    return "//" in line or stripped.startswith("*") or stripped.startswith("/*")


def migrate(text, sql_mode):
    out = []
    pos = 0
    n = 0
    while True:
        m = re.compile(r'\bround\(').search(text, pos)
        if not m:
            out.append(text[pos:])
            break
        if in_comment(text, m.start()):
            out.append(text[pos:m.end()])
            pos = m.end()
            continue
        close = find_balanced(text, m.end() - 1)
        inside = text[m.end():close]
        expr, scale = top_level_rsplit_comma(inside)
        # the scale may sit on its own stripMargin-continued line: ",\n  |  6"
        scale = scale.strip().lstrip("|").strip() if scale is not None else None
        if scale in ("6", "4", "3"):
            out.append(text[pos:m.start()])
            if sql_mode:
                mult = {"6": "1000000.0", "4": "10000.0", "3": "1000.0"}[scale]
                out.append(f"floor(({expr}) * {mult} + 0.5) / {mult}")
            else:
                out.append(f"u{scale}({expr})")
            n += 1
            pos = close + 1
        else:
            out.append(text[pos:close + 1])
            pos = close + 1
    return "".join(out), n


def main():
    for path in SCALA_FILES:
        src = open(path).read()
        new, n = migrate(src, sql_mode=False)
        open(path, "w").write(new)
        print(f"{path}: {n} scala sites migrated")
    src = open(SQL_FILE).read()
    new, n = migrate(src, sql_mode=True)
    open(SQL_FILE, "w").write(new)
    print(f"{SQL_FILE}: {n} sql sites migrated")


if __name__ == "__main__":
    main()
