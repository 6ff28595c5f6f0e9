#!/bin/bash
# Round-5 chip queue, part 4: the 30-epoch papers plateau run.  Double
# gate: queue3 must have released the chip AND the full-papers host job
# (jobA) must have released its RAM — the papers CLI holds ~40 GB host
# while jobA peaks near 100 GB; they cannot overlap on a 125 GB host.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 600); do
  grep -q "R5 QUEUE3 DONE" logs/r5_cert.log 2>/dev/null && \
  grep -q "R5 JOBA DONE" logs/r5_full_papers.log 2>/dev/null && break
  sleep 60
done
bash scripts/r5_papers_run.sh
