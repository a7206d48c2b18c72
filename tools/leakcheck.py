#!/usr/bin/env python3
"""Leak scan: greps the shipped source tree for anything that looks like
a non-public reference (private package imports, unknown URLs/buckets,
chat links, credential shapes, undocumented env vars) and writes
LEAKCHECK.json. Self-evidencing: the artifact carries the run's UTC
timestamp, scanned-file count and byte count, so a fresh run is
distinguishable from a hand-edited round bump.

Usage: python3 tools/leakcheck.py <round_number>
"""
import datetime
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCAN_DIRS = ["src", "project"]
SCAN_EXT = (".scala", ".sbt", ".java", ".py", ".sql", ".conf")

# Only reverse-domain-rooted imports can leak a private artifact; local
# value imports (spark.implicits._, ds.sparkSession...) and same-package
# object imports have no namespace to leak. Flag reverse-domain roots
# outside the documented public set.
PUBLIC_IMPORT = re.compile(
    r"^\s*import\s+(org\.apache\.|org\.scalatest|org\.scalacheck|"
    r"org\.slf4j|com\.fasterxml)")
IMPORT = re.compile(
    r"^\s*import\s+(com|org|io|net|ai|dev|cloud|me|sh)\.")

# host must be a real dotted name — skips `https://host` placeholders
URL = re.compile(r"https?://([a-zA-Z0-9-]+(?:\.[a-zA-Z0-9-]+)+)")
PUBLIC_HOSTS = (
    "github.com", "apache.org", "arxiv.org", "wikipedia.org", "duckdb.org",
    "example.com", "example.org", "localhost", "www.w3.org", "spark.apache.org",
)

CHECKS = {
    # import of a namespace outside the documented public set
    "internal-import": lambda line: bool(
        IMPORT.match(line) and not PUBLIC_IMPORT.match(line)),
    # URL whose host is not a known public host
    "internal-url": lambda line: any(
        not host.endswith(PUBLIC_HOSTS) for host in URL.findall(line)),
    # package declaration outside the project namespace
    "internal-pkg2": lambda line: bool(
        re.match(r"^\s*package\s+(?!graft)[a-zA-Z]", line)),
    # object-store / cluster URIs (none should be hardcoded)
    "internal-bucket": lambda line: bool(
        re.search(r"\b(s3a?|gs|abfss|wasbs?)://[a-zA-Z0-9]", line)),
    # chat/workspace links
    "slack-link": lambda line: bool(
        re.search(r"slack\.com|slack://|join\.slack", line, re.I)),
    # credential shapes
    "api-key": lambda line: bool(
        re.search(r"AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{24,}|"
                  r"-----BEGIN [A-Z ]*PRIVATE KEY", line)),
    # env-var reads outside the documented SPARK_*/build set
    "axon-env": lambda line: bool(
        re.search(r"sys\.env", line) and not re.search(
            r"SPARK_|COURSIER_|JAVA_|PATH|HOME\b", line)),
}


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else -1
    hits = {k: [] for k in CHECKS}
    n_files = 0
    n_bytes = 0
    for d in SCAN_DIRS:
        for dirpath, _, files in os.walk(os.path.join(ROOT, d)):
            for f in sorted(files):
                if not f.endswith(SCAN_EXT):
                    continue
                path = os.path.join(dirpath, f)
                rel = os.path.relpath(path, ROOT)
                n_files += 1
                n_bytes += os.path.getsize(path)
                with open(path, encoding="utf-8", errors="replace") as fh:
                    for i, line in enumerate(fh, 1):
                        for cat, pred in CHECKS.items():
                            if pred(line):
                                hits[cat].append(f"{rel}:{i}: {line.strip()[:160]}")
    out = {
        "round": rnd,
        "run_utc": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "scanned_files": n_files,
        "scanned_bytes": n_bytes,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    # Two copies: the driver regenerates LEAKCHECK.json in its own schema
    # after the final commit (discarding the self-evidencing stamps r12
    # asked for — observed in round 13's working tree), so the builder's
    # stamped artifact also persists under a name the driver leaves alone.
    for name in ("LEAKCHECK.json", "LEAKCHECK_builder.json"):
        with open(os.path.join(ROOT, name), "w") as fh:
            json.dump(out, fh, indent=2)
    print(f"LEAKCHECK: {n_files} files, {out['n_hits']} hits")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
