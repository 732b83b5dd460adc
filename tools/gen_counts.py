#!/usr/bin/env python3
"""Regenerate the hand-rot-prone counts in README.md / COVERAGE.md from
run artifacts, so the docs can never drift from the tree again (the
count lines were stale three rounds running when edited by hand).

Sources of truth:
  - an `sbt test` log        -> "Total number of tests run: N",
                                "Suites: completed M"
  - a `graft.Verify` out dir -> one result dir per SparkEntry query
                                (total), oracle_sql.json (checkable)

Usage: python3 tools/gen_counts.py <sbt_test_log> <verify_out_dir>
Rewrites the count lines in place and prints what changed; exits 1 if
either file lacked the expected line (so precommit can gate on it).
"""
import json
import pathlib
import re
import sys


def main() -> int:
    log_path, out_dir = sys.argv[1], sys.argv[2]
    log = pathlib.Path(log_path).read_text()
    tests = re.findall(r"Total number of tests run: (\d+)", log)
    suites = re.findall(r"Suites: completed (\d+)", log)
    if not tests or not suites:
        print(f"no test/suite totals in {log_path}", file=sys.stderr)
        return 1
    n_tests, n_suites = tests[-1], suites[-1]

    out = pathlib.Path(out_dir)
    # _exports holds oracle-support frames (signatures/centroids the
    # oracle SQL reads back), not query results — never count it
    queries = sorted(p.name for p in out.iterdir()
                     if p.is_dir() and not p.name.startswith("_"))
    oracles = json.loads((out / "oracle_sql.json").read_text())
    n_q, n_oracle = len(queries), len(oracles)

    repo = pathlib.Path(__file__).resolve().parent.parent
    edits = [
        (repo / "README.md",
         r"# \d+ tests / \d+ suites",
         f"# {n_tests} tests / {n_suites} suites"),
        (repo / "README.md",
         r"`SparkEntry\.queries` \(\d+ entries\) is the operator surface; "
         r"\d+ have DuckDB",
         f"`SparkEntry.queries` ({n_q} entries) is the operator surface; "
         f"{n_oracle} have DuckDB"),
        (repo / "COVERAGE.md",
         r"\(\d+ of \d+ oracle-matched against DuckDB at sf0\.01",
         f"({n_oracle} of {n_q} oracle-matched against DuckDB at sf0.01"),
    ]
    rc = 0
    for path, pat, repl in edits:
        text = path.read_text()
        new, n = re.subn(pat, repl, text)
        if n == 0:
            print(f"{path.name}: pattern not found: {pat}", file=sys.stderr)
            rc = 1
        elif new != text:
            path.write_text(new)
            print(f"{path.name}: -> {repl}")
        else:
            print(f"{path.name}: already current ({repl})")
    rc |= check_coverage_rows(repo / "COVERAGE.md", queries, oracles)
    return rc


def check_coverage_rows(coverage, queries, oracles) -> int:
    """Diff per-query oracle status against COVERAGE.md's table rows so
    a conversion can't go stale again (r14 verdict: the rows for d03/
    d15/d15b/m03/m04 still said rows-only a round after they turned
    oracle-green). A row's query cell names driver queries by their
    short id (d03, m05b, ...); its status cell must say rows-only iff
    NONE of those queries has a DuckDB oracle."""
    short = lambda name: name.split("_")[0]
    checkable = {short(k) for k in oracles}
    rows_only = {short(q) for q in queries} - checkable
    rc = 0
    for lineno, line in enumerate(coverage.read_text().splitlines(), 1):
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 4 or not cells[1] or cells[1].startswith("-"):
            continue
        ids = set(re.findall(r"\b([a-z]{1,2}\d{2}b?)\b", cells[2]))
        status = cells[3]
        if status.startswith("rows-only") and ids & checkable:
            print(f"COVERAGE.md:{lineno}: says rows-only but "
                  f"{sorted(ids & checkable)} have DuckDB oracles",
                  file=sys.stderr)
            rc = 1
        if status.startswith("✓") and ids and not (ids & checkable) \
                and ids <= rows_only:
            print(f"COVERAGE.md:{lineno}: claims oracle-matched but "
                  f"{sorted(ids)} are rows-only in oracle_sql.json",
                  file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
