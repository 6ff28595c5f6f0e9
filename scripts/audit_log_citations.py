"""Round-end receipt audit (VERDICT r4 item 2).

Scans the docs and tests for ``logs/<name>`` citations and fails loudly
if any cited file is absent from the working tree — the round-4 lesson:
two cited receipts (r4_cert.log, r4_int32.log) were lost to a container
reset and the round shipped with dangling citations.  Run this at the
end of every chip queue and before the round-end commit; cited logs
should also be ``git add -f``-ed (logs/ is otherwise gitignored) so a
reset cannot erase them again.
"""

import os
import re
import sys

DOC_GLOBS = [
    "README.md",
    "VERDICT_RESPONSES.md",
    "CAPABILITIES.md",
    "docs",
    "tests",
    "falcon_ttdforgnns_tpu",
]

CITE = re.compile(r"logs/[A-Za-z0-9_.\-]+\.(?:log|json|txt)")


def iter_files():
    for top in DOC_GLOBS:
        if os.path.isfile(top):
            yield top
        elif os.path.isdir(top):
            for root, _, names in os.walk(top):
                if "__pycache__" in root:
                    continue
                for n in names:
                    if n.endswith((".md", ".py")):
                        yield os.path.join(root, n)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    os.chdir(os.path.dirname(here))
    missing = {}
    cited = set()
    for path in iter_files():
        try:
            with open(path, encoding="utf-8", errors="replace") as f:
                text = f.read()
        except OSError:
            continue
        for line in text.splitlines():
            # historical mentions are allowed IF the line says so: a
            # citation on a line containing "lost" or "superseded" is
            # documenting a gap, not claiming a receipt
            historical = "lost" in line or "superseded" in line
            for m in CITE.finditer(line):
                cited.add(m.group(0))
                if not os.path.exists(m.group(0)) and not historical:
                    missing.setdefault(m.group(0), []).append(path)
    print(f"audit: {len(cited)} distinct logs/ citations")
    if missing:
        for log, sources in sorted(missing.items()):
            print(f"MISSING {log}  (cited in {', '.join(sorted(set(sources)))})")
        sys.exit(1)
    print("audit: all cited logs exist")


if __name__ == "__main__":
    main()
