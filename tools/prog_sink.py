"""Deterministic omprog sink program for the driver facet
(testsuites/omprog-feedback-bin.sh shape: startup OK, then one status
reply per line, stdout flushed every write).

Replies "Error: div7" for lines whose ``msgnum:<digits>`` value is
congruent 3 mod 7, "OK" otherwise — a closed-form accept/reject the
DuckDB oracle can mirror.
"""

import re
import sys

print("OK")
sys.stdout.flush()

for line in sys.stdin:
    m = re.search(r"msgnum:(\d+)", line)
    if m and int(m.group(1)) % 7 == 3:
        print("Error: div7")
    else:
        print("OK")
    sys.stdout.flush()
