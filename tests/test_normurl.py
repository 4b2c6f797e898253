"""normurl ports of the reference's test tables.

Sources: normurl/normurl_test.go:8-110, normurl/parts_test.go:16-74.
"""

import datetime

import pytest

from go_boilerpipe_spark import normurl

PARSE_CASES = {
    "http://powerbrokerconfidential.com/marcus-millichap-close-5430-west-sahara-sandyplace-llc/?utm_source=CALV+News+April+13%2C+2017&utm_campaign=CALV+September+26%2C+2016&utm_medium=email":
        "http://powerbrokerconfidential.com/marcus-millichap-close-5430-west-sahara-sandyplace-llc",
    "http://www.google.com/path/": "http://www.google.com/path",
    "https://www.google.com/path/": "https://www.google.com/path",
    "www.google.com/path/": "http://www.google.com/path",
    "www.google.com/": "http://www.google.com/",
}


@pytest.mark.parametrize("rawurl,expected", PARSE_CASES.items())
def test_parse(rawurl, expected):
    assert str(normurl.parse(rawurl)) == expected


DATE_CASES = {
    "scheme://host/path/2016/nov/16?query#fragment": datetime.date(2016, 11, 16),
    "scheme://host/path/2017-01?query#fragment": datetime.date(2017, 1, 1),
    "scheme://host/path/2016-12-15-title?query#fragment": datetime.date(2016, 12, 15),
}


@pytest.mark.parametrize("rawurl,expected", DATE_CASES.items())
def test_date(rawurl, expected):
    assert normurl.parse(rawurl).date() == expected


ROOT_CASES = {
    "https://vegasinc.lasvegassun.com/business/real-estate/?page=1": "lasvegassun.com",
    "https://lasvegassun.com/business/real-estate/?page=1": "lasvegassun.com",
    "https://.lasvegassun.com/business/real-estate/?page=1": "lasvegassun.com",
    ".lasvegassun.com/business/real-estate/?page=1": "lasvegassun.com",
}


@pytest.mark.parametrize("rawurl,expected", ROOT_CASES.items())
def test_root(rawurl, expected):
    assert normurl.parse(rawurl).root() == expected


IS_CHILD_CASES = [
    (
        "https://vegasinc.lasvegassun.com/business/real-estate/",
        "https://vegasinc.lasvegassun.com/business/real-estate/2017/sep/06/life-is-good-for-home-sellers-not-so-much-for-buye/",
        True,
    ),
    (
        "https://vegasinc.lasvegassun.com/business/real-estate/",
        "https://lasvegassun.com/business/real-estate/2017/sep/06/life-is-good-for-home-sellers-not-so-much-for-buye/",
        True,
    ),
]


@pytest.mark.parametrize("root,ref,expected", IS_CHILD_CASES)
def test_is_child(root, ref, expected):
    assert normurl.is_child(normurl.parse(root), normurl.parse(ref)) == expected


PARTS_CASES = {
    "http://lasvegassun.com/news": ("lasvegassun.com", "", "/news", "http"),
    "https://lasvegassun.com:8080/news": ("lasvegassun.com", "8080", "/news", "https"),
    "https://lasvegassun.com:8080/news?test=1": ("lasvegassun.com", "8080", "/news", "https"),
    "https://lasvegassun.com:8080/news#fragment": ("lasvegassun.com", "8080", "/news", "https"),
    "https://lasvegassun.com:8080/news?test=1#fragment": ("lasvegassun.com", "8080", "/news", "https"),
}


@pytest.mark.parametrize("rawurl,parts", PARTS_CASES.items())
def test_parts(rawurl, parts):
    u = normurl.parse(rawurl)
    assert (u.hostname(), u.port(), u.path, u.scheme) == parts
