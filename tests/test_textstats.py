"""Marker-token counting semantics (ADVICE r2: the single ' (w1|w2) '
alternation consumed the shared trailing space, so adjacent marker words
counted once). The fixed counting equals
``len([t for t in text.split() if t in markers])``.
"""

import pytest
from pyspark.sql import functions as F

from go_boilerpipe_spark.functions import textstats
from go_boilerpipe_spark.spark_session import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session(
        app_name="textstats-tests", master="local[4]", shuffle_partitions=4
    )
    yield s
    s.stop()


# (text, expected count against the English marker set)
CASES = [
    ("of the people", 2),            # adjacent markers each counted (was 1)
    ("it was the best of times", 4),
    ("the the the", 3),
    ("of\nthe\tpeople", 2),          # whitespace variants now counted too
    ("", 0),
    ("other words only", 0),
    (" the ", 1),
    ("weather them", 0),             # substrings don't count
    ("the  and   of", 3),            # multi-space runs
]


def test_marker_hits_adjacency(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i int, text string"
    )
    got = dict(
        df.select(
            "i",
            textstats._marker_hits(
                textstats.padded_lc(F.col("text")),
                textstats.LANG_MARKERS["en"],
            ).alias("n"),
        ).collect()
    )
    for i, (t, want) in enumerate(CASES):
        assert got[i] == want, repr(t)


def test_marker_hits_equals_python_split(spark):
    texts = [
        "the and of to is in",
        "a the b the c",
        "für den den und der die das",
        "x  the   and x",
        "le la les et est",
        "el los las es una que en",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    for lang, ws in textstats.LANG_MARKERS.items():
        got = dict(
            df.select(
                "i",
                textstats._marker_hits(
                    textstats.padded_lc(F.col("text")), ws
                ).alias("n"),
            ).collect()
        )
        for i, t in enumerate(texts):
            want = sum(1 for tok in t.lower().split() if tok in ws)
            assert got[i] == want, (lang, t)
