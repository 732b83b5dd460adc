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
    return rc


if __name__ == "__main__":
    sys.exit(main())
