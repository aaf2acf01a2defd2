#!/usr/bin/env python3
"""Provenance-stamped leak scan over the builder-authored tree.

VERDICT r10 item 5: the driver-side LEAKCHECK.json carries no commit sha
or timestamp, so a round-over-round diff of it is indistinguishable from
a hand-edit. This is the builder-side mirror: it scans src/ and tools/
for non-public material (internal package roots, corp URLs, cloud bucket
schemes, chat permalinks, credential shapes, internal env-var prefixes),
and stamps WHAT it scanned — the HEAD sha, whether the worktree was
dirty, the file count, and the pattern set — so the archived artifact in
probes/rNN/ proves its own provenance.

The pattern set is intentionally generic (shapes of internal material,
not a blocklist of known names): anything matching is for a human to
adjudicate, and known-benign fixtures are listed in ALLOW with the
reason inline.

Usage: python3 tools/leak_scan.py [outfile]   (default: stdout)
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# pattern name -> regex (case-insensitive where noted)
PATTERNS = {
    # imports/packages under obviously-internal roots
    "internal-import": re.compile(
        r"import\s+(?:com|org|net)\.(?:corp|internal|intern|proprietary)\b"),
    # URLs that are not public OSS/doc hosts
    "internal-url": re.compile(
        r"https?://(?!(?:www\.)?(?:github\.com|apache\.org|spark\.apache\.org|"
        r"duckdb\.org|scala-lang\.org|scalatest\.org|arxiv\.org|doi\.org|"
        r"en\.wikipedia\.org|docs\.oracle\.com|openjdk\.org|json\.org|"
        r"localhost|127\.0\.0\.1|example\.(?:com|org|net)))[A-Za-z0-9.-]+\.[a-z]{2,}"),
    # cloud-storage bucket schemes (none should appear: all IO is local parquet)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[A-Za-z0-9._-]+"),
    # chat permalinks / channel shortlinks
    "slack-link": re.compile(r"(?:slack\.com/archives|go/[a-z][a-z0-9-]{2,})"),
    # credential shapes: long opaque secrets assigned to key-ish names
    "api-key": re.compile(
        r"(?i)(?:api[_-]?key|secret|token|passw(?:or)?d)\s*[=:]\s*['\"][A-Za-z0-9+/_-]{16,}['\"]"),
    # env vars outside the project's own SPARK_GRAFT_* namespace that look scoped
    "internal-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\"(?!SPARK_GRAFT_|SPARK_|JAVA_|PATH|HOME|USER|TMPDIR)[A-Z][A-Z0-9_]*_(?:INTERNAL|CORP|PROD|STAGING)\w*\""),
}

# (pattern, path-suffix, regex-of-line) triples adjudicated benign, with why.
# Currently empty: the q106 PII fixture's example.org email domain needs no
# entry — the internal-url pattern's negative lookahead already excludes
# example.(com|org|net) URLs, and bare email domains never match the
# https?:// prefix (ADVICE r11: the old entry here was unreachable).
ALLOW = []

SCAN_DIRS = ["src", "tools"]
SKIP_SUFFIX = {".parquet", ".crc", ".class", ".jar"}


def git(*args):
    try:
        return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                              text=True, timeout=30).stdout.strip()
    except Exception as e:  # provenance must never crash the scan
        return f"<git failed: {e}>"


def allowed(name, path, line):
    for pname, suffix, rx in ALLOW:
        if pname == name and (suffix is None or path.endswith(suffix)) \
                and rx.search(line):
            return True
    return False


def main():
    hits = {name: [] for name in PATTERNS}
    n_files = 0
    for d in SCAN_DIRS:
        for p in sorted((REPO / d).rglob("*")):
            if not p.is_file() or p.suffix in SKIP_SUFFIX or "target" in p.parts:
                continue
            n_files += 1
            rel = str(p.relative_to(REPO))
            try:
                text = p.read_text(errors="replace")
            except OSError:
                continue
            for i, line in enumerate(text.splitlines(), 1):
                for name, rx in PATTERNS.items():
                    if rx.search(line) and not allowed(name, rel, line):
                        hits[name].append(f"{rel}:{i}: {line.strip()[:160]}")
    out = {
        "scanned_commit": git("rev-parse", "HEAD"),
        "worktree_dirty": bool(git("status", "--porcelain")),
        "scanned_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scan_dirs": SCAN_DIRS,
        "n_files": n_files,
        "patterns": {k: v.pattern for k, v in PATTERNS.items()},
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    text = json.dumps(out, indent=2)
    if len(sys.argv) > 1:
        Path(sys.argv[1]).write_text(text + "\n")
        print(f"leak_scan: {out['n_hits']} hits over {n_files} files "
              f"at {out['scanned_commit'][:12]} -> {sys.argv[1]}")
    else:
        print(text)
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
