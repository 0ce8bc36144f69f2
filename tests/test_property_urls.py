"""Property test: canonicalize_url (Catalyst expression) vs an
independent pure-Python implementation of the same spec, over a
constrained random URL alphabet. Catches engine-semantics drift (regex
dialect, split/sort behavior) that crafted cases might miss."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from erigon_extract_spark.operators.urls import canonicalize_url

SCHEMES = ["http", "HTTP", "https", "ftp"]
HOSTS = ["Example.COM", "a.b.c", "x.org"]
PORTS = ["", ":80", ":443", ":8080"]
SEGS = st.lists(
    st.text(alphabet="abXY19._~-", min_size=1, max_size=4), max_size=3
)
PARAM_KEYS = ["a", "B", "utm_source", "utm_x", "fbclid", "gclid", "z9"]


def py_canonicalize(url: str) -> str:
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    if not m:
        return ""
    scheme = m.group(1).lower()
    hostport = re.match(
        r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url
    ).group(1).lower()
    default = {"http": ":80", "https": ":443"}.get(scheme)
    host = (
        hostport[: -len(default)]
        if default and hostport.endswith(default)
        else hostport
    )
    res = re.match(
        r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", url
    ).group(1)
    path = re.sub(r"/+$", "", res.split("?", 1)[0]) or "/"
    qm = re.search(r"\?(.*)$", res)
    params = sorted(
        p
        for p in (qm.group(1).split("&") if qm else [])
        if p and not re.match(r"^(utm_[^=]*|fbclid|gclid)(=.*)?$", p)
    )
    return scheme + "://" + host + path + ("?" + "&".join(params) if params else "")


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(SCHEMES))
    host = draw(st.sampled_from(HOSTS))
    port = draw(st.sampled_from(PORTS))
    path = "".join("/" + s for s in draw(SEGS))
    trail = draw(st.sampled_from(["", "/", "//"]))
    pairs = draw(
        st.lists(
            st.tuples(st.sampled_from(PARAM_KEYS),
                      st.text(alphabet="ab12", max_size=2)),
            max_size=4,
        )
    )
    query = "&".join(f"{k}={v}" if v else k for k, v in pairs)
    frag = draw(st.sampled_from(["", "#x", "#a/b?c"]))
    return (
        f"{scheme}://{host}{port}{path}{trail}"
        + (f"?{query}" if query else "")
        + frag
    )


@settings(max_examples=30, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=20))
def test_canonicalize_matches_python_reference(spark, batch):
    df = spark.createDataFrame([(u,) for u in batch], "url string")
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [py_canonicalize(u) for u in batch]
