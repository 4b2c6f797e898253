"""URL normalization — port of the reference's ``normurl`` package.

Covers Parse/NewURL defaults (scheme defaulting, query/fragment stripping,
path.Clean, lowercased String — normurl/normurl.go:71-122,184-186), the
query-key blacklist (normurl.go:60-65), path-date extraction
(normurl.go:195-288) and host parts (normurl/parts.go:9-44).

This pure-Python form serves the golden pytest gate; the Spark-native column
expressions live in ``go_boilerpipe_spark.functions.urls``.
"""

from __future__ import annotations

import re
from datetime import date, timedelta

DEFAULT_QUERY_KEY_BLACKLIST = frozenset(
    ("email_subscriber", "utm_campaign", "utm_medium", "utm_source")
)

_SCHEME_OK = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*$")


class URL:
    __slots__ = ("scheme", "host", "path", "query", "fragment")

    def __init__(self, scheme="", host="", path="", query="", fragment=""):
        self.scheme = scheme
        self.host = host
        self.path = path
        self.query = query
        self.fragment = fragment

    # -- net/url-ish parsing (subset: no userinfo/opaque) ---------------------

    @classmethod
    def _raw_parse(cls, rawurl: str) -> "URL":
        u = cls()
        s = rawurl
        i = s.find("#")
        if i >= 0:
            s, u.fragment = s[:i], s[i + 1 :]
        i = s.find(":")
        if i > 0 and _SCHEME_OK.match(s[:i]):
            u.scheme, s = s[:i].lower(), s[i + 1 :]
        i = s.find("?")
        if i >= 0:
            s, u.query = s[:i], s[i + 1 :]
        if s.startswith("//"):
            s = s[2:]
            i = s.find("/")
            if i >= 0:
                u.host, u.path = s[:i], s[i:]
            else:
                u.host, u.path = s, ""
        else:
            u.path = s
        return u

    def _unnormalized_str(self) -> str:
        out = []
        if self.scheme:
            out.append(self.scheme + ":")
        if self.host or self.path:
            out.append("//")
        out.append(self.host)
        if self.path and not self.path.startswith("/") and self.host:
            out.append("/")
        out.append(self.path)
        if self.query:
            out.append("?" + self.query)
        if self.fragment:
            out.append("#" + self.fragment)
        return "".join(out)

    def __str__(self) -> str:
        # normurl.go:184-186 — the whole serialized URL is lowercased
        return self._unnormalized_str().lower()

    # -- parts (normurl/parts.go) ---------------------------------------------

    def hostname(self) -> str:
        i = self.host.find(":")
        return self.host if i == -1 else self.host[:i]

    def port(self) -> str:
        i = self.host.find(":")
        return "" if i == -1 else self.host[i + 1 :]

    def root(self) -> str:
        s = self.hostname()
        i = s.rfind(".")
        if i == -1:
            return s
        j = s.rfind(".", 0, i)
        if j == -1:
            return s
        return s[j + 1 :]

    # -- dates (normurl.go:195-288) --------------------------------------------

    def date(self):
        """Return a ``datetime.date`` or None (UTC midnight in the Go code)."""
        s = str(self)
        for pattern, n in _DATE_REGEXPS:
            m = pattern.search(s)
            if not m:
                continue
            ss = m.groups()
            if len(ss) != n:
                continue
            year = int(ss[0])
            try:
                month = int(ss[1])
            except ValueError:
                month = _MONTHS.get(ss[1].lower())
                if month is None:
                    continue
            day = int(ss[2]) if len(ss) > 2 else 1
            return _go_time_date(year, month, day)
        return None


_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

# Order matters (normurl.go:229-246)
_DATE_REGEXPS = (
    (re.compile(r"/([0-9]{4})/([a-zA-Z]{3})/([0-9]{2})[/]*"), 3),
    (re.compile(r"/([0-9]{4})-([0-9]{2})-([0-9]{2})"), 3),
    (re.compile(r"/([0-9]{4})-([0-9]{2})[/]*"), 2),
)


def _go_time_date(year: int, month: int, day: int):
    """Go ``time.Date`` normalizes out-of-range components instead of
    erroring; replicate (e.g. month 13 → January next year)."""
    year += (month - 1) // 12
    month = (month - 1) % 12 + 1
    try:
        return date(year, month, 1) + timedelta(days=day - 1)
    except (ValueError, OverflowError):
        return None


def _path_clean(p: str) -> str:
    """Go path.Clean."""
    if p == "":
        return "."
    rooted = p.startswith("/")
    parts = []
    for seg in p.split("/"):
        if seg == "" or seg == ".":
            continue
        if seg == "..":
            if parts and parts[-1] != "..":
                parts.pop()
            elif not rooted:
                parts.append("..")
        else:
            parts.append(seg)
    out = "/".join(parts)
    if rooted:
        out = "/" + out
    if out == "":
        return "/" if rooted else "."
    return out


def _encode_query(query: str, blacklist=DEFAULT_QUERY_KEY_BLACKLIST) -> str:
    """url.Values round-trip minus blacklisted keys, Encode() sorts keys."""
    from urllib.parse import parse_qsl, quote_plus

    pairs = [
        (k, v)
        for k, v in parse_qsl(query, keep_blank_values=True)
        if k not in blacklist
    ]
    pairs.sort(key=lambda kv: kv[0])
    return "&".join(f"{quote_plus(k)}={quote_plus(v)}" for k, v in pairs)


def parse(rawurl: str, keep_query: bool = False, keep_fragments: bool = False) -> URL:
    """normurl.Parse + NewURL (normurl.go:71-122)."""
    u = URL._raw_parse(rawurl)
    if u.scheme == "":
        u.scheme = "http"
        u = URL._raw_parse(u._unnormalized_str())
    if not keep_query:
        u.query = ""
    else:
        u.query = _encode_query(u.query)
    if not keep_fragments:
        u.fragment = ""
    u.path = _path_clean(u.path)
    return u


def is_child(root: URL, ref: URL) -> bool:
    # normurl.go:144-154
    if root.root() != ref.root():
        return False
    if not ref.path.startswith(root.path):
        return False
    return str(ref) != str(root)
