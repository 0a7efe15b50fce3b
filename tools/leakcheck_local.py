#!/usr/bin/env python3
"""Builder-side leak sweep with provenance (round-11 verdict item 5:
unstamped artifacts are indistinguishable from stale number bumps; the
driver's LEAKCHECK.json carries no HEAD sha, so this committed sidecar
records WHAT was swept and AT WHICH commit).

Scans the shippable surface (src/, tools/, build.sbt, project/) for
generic secret/endpoint patterns — credentials, private keys, webhook
URLs, cloud buckets, and non-allowlisted http(s) URLs. All patterns are
public-generic; the sweep is self-contained.

Usage: python3 tools/leakcheck_local.py [out.json]
Exit 1 if any hit (so it can gate a commit).
"""
import datetime
import json
import os
import re
import subprocess
import sys

PATTERNS = {
    "aws-access-key": re.compile(r"AKIA[0-9A-Z]{16}"),
    "private-key-block": re.compile(r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
    "webhook-url": re.compile(r"hooks\.slack\.com|discord\.com/api/webhooks"),
    "cloud-bucket": re.compile(r"\b(s3|gs|abfss?|wasbs?)://[a-z0-9][a-z0-9._-]+"),
    "bearer-token": re.compile(r"(?i)\b(authorization:\s*bearer\s+[A-Za-z0-9._-]{16,}"
                               r"|api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9]{16,})"),
    # any http(s) URL outside public doc/test hosts (localhost is the
    # RestJsonSource spec's own server)
    "url": re.compile(r"https?://(?!localhost|127\.0\.0\.1|www\.w3\.org|"
                      r"purl\.org|json\.org|example\.com|github\.com|"
                      r"spark\.apache\.org|openjdk\.org|schemas\.|"
                      r"maven\.apache\.org|www\.apache\.org)[\w./-]+"),
}
ROOTS = ["src", "tools", "project", "build.sbt"]
EXT = {".scala", ".py", ".sbt", ".md", ".json", ".conf", ".properties"}


def files():
    for root in ROOTS:
        if os.path.isfile(root):
            yield root
            continue
        for d, _, names in os.walk(root):
            if "target" in d.split(os.sep):
                continue
            for n in names:
                if os.path.splitext(n)[1] in EXT:
                    yield os.path.join(d, n)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_LOCAL.json"
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    for path in files():
        n_files += 1
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            for kind, pat in PATTERNS.items():
                if pat.search(line):
                    hits[kind].append(f"{path}:{lineno}: {line.strip()[:160]}")
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, check=True).stdout.strip()
    except (OSError, subprocess.CalledProcessError):
        sha = None
    n = sum(len(v) for v in hits.values())
    artifact = {
        "head_sha": sha,
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "files_scanned": n_files,
        "n_hits": n,
        "hits": hits,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"{out_path}: {n_files} files, {n} hits")
    if n:
        sys.exit(1)


if __name__ == "__main__":
    main()
