"""Strict RFC3339 timestamp parsing matching Go ``time.Parse(time.RFC3339)``.

Used for ``<time datetime=...>`` capture (content_handler.go:103-113) and
JSON-LD ``datePublished`` (``time.Time.UnmarshalJSON``, boilerpipe.go:160-166).
Go's parse is strict: full date+time, seconds required, offset required
('Z'/'z' or ±hh:mm), optional fractional seconds. Python's
``datetime.fromisoformat`` is laxer (accepts date-only, missing offset), so we
gate with a regex.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_RFC3339 = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T"
    r"(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(?:([Zz])|([+-])(\d{2}):(\d{2}))$"
)


def parse_rfc3339(s: str):
    """Return an aware ``datetime`` or None if Go's parser would error."""
    m = _RFC3339.match(s)
    if m is None:
        return None
    year, month, day, hour, minute, sec = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    micro = 0
    if frac:
        # Go keeps nanoseconds; datetime holds microseconds. Content output
        # never renders sub-second precision, so microseconds suffice.
        micro = int(round(float(frac) * 1e6))
        if micro >= 1000000:
            micro = 999999
    if m.group(8):
        tz = timezone.utc
    else:
        sign = 1 if m.group(9) == "+" else -1
        oh, om = int(m.group(10)), int(m.group(11))
        if oh > 23 or om > 59:
            return None
        tz = timezone(sign * timedelta(hours=oh, minutes=om))
    try:
        return datetime(year, month, day, hour, minute, sec, micro, tzinfo=tz)
    except ValueError:
        return None  # out-of-range component: Go errors too
