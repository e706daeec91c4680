"""Property-based codec tests (hypothesis): the write/read round trip must
hold for arbitrary record content, as long as records don't contain the
delimiter (the same contract the reference's Java-split semantics impose).
Exceeds the reference's test depth (it has no property tests)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mare_spark.codecs import BinaryFiles, TextFile, WholeTextFiles

# text without NUL (filesystem) and without the default delimiter
_record = st.text(
    alphabet=st.characters(blacklist_characters="\n\x00", blacklist_categories=("Cs",)),
    max_size=200,
)
_name = st.text(alphabet="abcdefghij0123456789_", min_size=1, max_size=20)


@settings(max_examples=50, deadline=None)
@given(st.lists(_record, max_size=30))
def test_textfile_roundtrip_property(tmp_path_factory, records):
    mp = TextFile("/t")
    p = str(tmp_path_factory.mktemp("prop") / "f.txt")
    mp.write(records, p)
    got = mp.read(p)
    # trailing empty records are dropped by Java-split semantics (possibly
    # to an empty list); only a truly EMPTY file reads as [""]
    want = list(records)
    while want and want[-1] == "":
        want.pop()
    if not records:
        want = [""]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(_name, _record, max_size=10, min_size=1))
def test_wholetextfiles_roundtrip_property(tmp_path_factory, files):
    mp = WholeTextFiles("/w")
    d = str(tmp_path_factory.mktemp("prop") / "dir")
    mp.write(list(files.items()), d)
    assert dict(mp.read(d)) == files


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(_name, st.binary(max_size=200), max_size=10, min_size=1))
def test_binaryfiles_roundtrip_property(tmp_path_factory, files):
    mp = BinaryFiles("/b")
    d = str(tmp_path_factory.mktemp("prop") / "dir")
    mp.write(list(files.items()), d)
    assert dict(mp.read(d)) == files


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="\x00$", blacklist_categories=("Cs",)
            ),
            max_size=100,
        ),
        max_size=10,
    )
)
def test_textfile_custom_delimiter_property(tmp_path_factory, records):
    """SDF-style multi-char delimiter: records may contain newlines."""
    mp = TextFile("/t", record_delimiter="\n$$$$\n")
    p = str(tmp_path_factory.mktemp("prop") / "f.sdf")
    mp.write(records, p)
    got = mp.read(p)
    want = list(records)
    while want and want[-1] == "":
        want.pop()
    if not records:
        want = [""]
    assert got == want
