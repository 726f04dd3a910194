"""Deterministic mmexternal message-modification plugin for the driver
facet (plugins/external/messagemod skeleton shape: line in, JSON reply
out, stdout flushed per message — see
plugins/external/mmexternal-SegFault-mm-python.py's plumbing note on
Python's stdout buffering).

Protocol (interface.input="msg"): for each MSG line carrying
``msgnum:<digits>``, reply with a well-known property set (msgid) plus
a ``$!`` subtree merge; otherwise reply the documented no-update ``{}``.
"""

import json
import re
import sys

for line in sys.stdin:
    m = re.search(r"msgnum:(\d+)", line)
    if m:
        n = str(int(m.group(1)))
        print(
            json.dumps(
                {
                    "msgid": "X" + n,
                    "$!": {"ext": {"mn": n, "prog": "msgmod"}},
                }
            )
        )
    else:
        print("{}")
    sys.stdout.flush()
