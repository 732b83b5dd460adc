#!/usr/bin/env python3
"""Scan the repo's sources for non-public references (internal package
imports, private URLs/buckets, chat links, credential-shaped strings,
internal env vars). Mirrors the driver's LEAKCHECK categories so the
committed artifact comes from a genuine local run.

Usage: python3 tools/leakcheck.py <round> > LEAKCHECK.json
"""
import json, os, re, sys

PATTERNS = {
    # reverse-domain imports outside the public Spark-classpath set
    # (local `import spark.implicits._`-style single-identifier prefixes
    # don't match the two-segment requirement)
    "internal-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|cloud)\."
        r"(?!fasterxml\.|sun\.|google\.|github\.|esotericsoftware\.|"
        r"netty\.|univocity\.|codahale\.|thoughtworks\.|clearspring\.|"
        r"ning\.|airlift\.|dropwizard\.|jpountz\.|razorvine\.)"),
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|0\.0\.0\.0|example\.com|"
        r"github\.com|arxiv\.org|aclanthology\.org|spark\.apache\.org|"
        r"duckdb\.org|en\.wikipedia\.org|doi\.org|dl\.acm\.org|"
        r"proceedings\.|openreview\.net|www\.w3\.org)[\w.-]+"),
    "internal-pkg2": re.compile(
        r"\b(com|net|io)\.(?!example\b)[a-z]+\.internal\b"),
    "internal-bucket": re.compile(
        r"s3a?://(?!bucket\b|test-bucket\b|my-bucket\b|example)[\w.-]+"),
    "slack-link": re.compile(r"slack\.com|app\.slack|#[a-z0-9-]*-(feedback|eng|infra)\b"),
    "api-key": re.compile(
        r"(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36}|"
        r"xox[baprs]-[A-Za-z0-9-]{10,}|-----BEGIN [A-Z ]*PRIVATE KEY-----)"),
    # generic secret-shaped env-var names; vendor/site-specific name
    # lists belong in the UNTRACKED tools/leakcheck.local.json, never
    # in the tree (a public repo must not name what it scans for)
    "env-token": re.compile(
        r"\b[A-Z0-9_]+_(INTERNAL|SECRET)_[A-Z0-9_]+\b"
        r"|\b[A-Z0-9_]{4,}_(TOKEN|API_KEY)\b"),
}

def load_local_patterns():
    """Extra detector regexes from tools/leakcheck.local.json
    ({"category": "regex", ...}) — untracked, operator-supplied."""
    p = os.path.join("tools", "leakcheck.local.json")
    if not os.path.isfile(p):
        return {}
    try:
        return {k: re.compile(v) for k, v in json.load(open(p)).items()}
    except (OSError, ValueError, re.error) as e:
        print(f"warning: ignoring {p}: {e}", file=sys.stderr)
        return {}

PATTERNS.update(load_local_patterns())

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "SURVEY.md", "COVERAGE.md",
              "SCALING.md", "PLANS.md", "FIXTURES.md", "TESTDATA.md"]
EXT = {".scala", ".sbt", ".py", ".md", ".json", ".conf", ".properties", ".sh"}

def files():
    for d in SCAN_DIRS:
        for root, _, names in os.walk(d):
            for n in names:
                if os.path.splitext(n)[1] in EXT:
                    yield os.path.join(root, n)
    for f in SCAN_FILES:
        if os.path.isfile(f):
            yield f

def selftest():
    """Plant one fixture line per category and assert detection — run
    with --selftest after editing patterns."""
    fixtures = {
        "internal-import": "import com.acmecorp.engine.Thing",
        "internal-url": "https://wiki.acmecorp.test/page",
        "internal-pkg2": "com.acmecorp.internal",
        "internal-bucket": "s3a://prod-data-lake/x",
        "slack-link": "see app.slack for details",
        "api-key": "AKIA" + "ABCDEFGHIJKLMNOP",
        "env-token": "export ACME_INTERNAL_API=1 MYSVC_TOKEN=x",
    }
    bad = [c for c, line in fixtures.items()
           if c in PATTERNS and not PATTERNS[c].search(line)]
    print("selftest: " + ("FAIL " + ",".join(bad) if bad else
          f"ok ({len(fixtures)} planted fixtures detected)"))
    sys.exit(1 if bad else 0)

def main():
    if "--selftest" in sys.argv:
        selftest()
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PATTERNS}
    self_path = os.path.join("tools", "leakcheck.py")
    for path in files():
        if path == self_path:
            continue  # the patterns themselves would self-match
        try:
            text = open(path, errors="replace").read()
        except OSError:
            continue
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in PATTERNS.items():
                if rx.search(line):
                    hits[cat].append(f"{path}:{i}: {line.strip()[:160]}")
    out = {"round": rnd, "n_hits": sum(len(v) for v in hits.values()), "hits": hits}
    print(json.dumps(out, indent=2))
    sys.exit(1 if out["n_hits"] else 0)

if __name__ == "__main__":
    main()
