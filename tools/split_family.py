#!/usr/bin/env python3
"""Generic family-file splitter (the round-12 split_relational.py pattern):
move a set of declared query keys — each entry chunk = its leading comment
block + body, verbatim — from BOTH the `queries` and `oracleSql` maps of a
source object into a new sibling object, pure code motion. The new file
reuses the source file's header (package + imports); the caller wires the
aggregator. Asserts every requested key is found exactly once per map.

Usage: split_family.py <srcFile> <newFile> <newObject> <key> [<key> ...]
"""
import re
import sys


def chunks_of(lines, lo, hi):
    """Entry chunks in a Map body between line indices [lo, hi):
    list of (key, start, end)."""
    keyre = re.compile(r'^    "(q_\w+)" ->')
    starts = [(i, keyre.match(lines[i]).group(1))
              for i in range(lo, hi) if keyre.match(lines[i])]
    out = []
    for n, (i, key) in enumerate(starts):
        s = i
        while s - 1 >= lo and lines[s - 1].lstrip().startswith("//"):
            s -= 1
        e = starts[n + 1][0] if n + 1 < len(starts) else hi
        # back the end up over the next entry's comment block
        if n + 1 < len(starts):
            while e - 1 > i and lines[e - 1].lstrip().startswith("//"):
                e -= 1
            while e - 1 > i and lines[e - 1].strip() == "":
                e -= 1
        out.append((key, s, e))
    return out


def main():
    src, dst, obj = sys.argv[1], sys.argv[2], sys.argv[3]
    keys = set(sys.argv[4:])
    lines = open(src).read().split("\n")

    qdef = next(i for i, l in enumerate(lines) if l.startswith("  def queries"))
    odef = next(i for i, l in enumerate(lines) if l.startswith("  def oracleSql"))
    # map bodies close with a line that is exactly "  )"
    qend = next(i for i in range(qdef, odef) if lines[i] == "  )")
    oend = next(i for i in range(odef, len(lines)) if lines[i] == "  )")

    moved, kept_drop = {"q": [], "o": []}, set()
    for tag, lo, hi in (("q", qdef + 1, qend), ("o", odef + 1, oend)):
        found = set()
        for key, s, e in chunks_of(lines, lo, hi):
            if key in keys:
                moved[tag].append((key, s, e))
                kept_drop.update(range(s, e))
                found.add(key)
        missing = keys - found
        assert not missing, f"{tag}: keys not found: {missing}"

    header_end = next(i for i, l in enumerate(lines) if l.startswith("object "))
    header = lines[:header_end]

    def body(tag):
        parts = []
        for key, s, e in moved[tag]:
            chunk = lines[s:e]
            while chunk and chunk[-1].strip() == "":
                chunk.pop()
            if not chunk[-1].rstrip().endswith(","):
                chunk[-1] = chunk[-1] + ","
            parts.extend(chunk + [""])
        if parts and parts[-1] == "":
            parts.pop()
        return parts

    new = header + [
        f"object {obj} {{",
        "",
        "  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(",
    ] + body("q") + [
        "  )",
        "",
        "  def oracleSql: Map[String, String] = Map(",
    ] + body("o") + [
        "  )",
        "}",
        "",
    ]
    open(dst, "w").write("\n".join(new))

    remaining = [l for i, l in enumerate(lines) if i not in kept_drop]
    open(src, "w").write("\n".join(remaining))
    print(f"moved {len(moved['q'])} queries + {len(moved['o'])} oracles -> {dst}")


if __name__ == "__main__":
    main()
