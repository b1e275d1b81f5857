import pytest

from multithreading_string_matching_tpu.io.patterns import load_patterns, split_c_tokens


def test_strings_txt(strings_path):
    pats = load_patterns(strings_path)
    assert len(pats) == 97           # BASELINE.md: 97 tokens
    assert len(set(pats)) == 87      # duplicates kept as separate entries
    assert pats.count(b"ack") == 3
    assert pats.count(b"content") == 2
    assert all(2 <= len(p) <= 12 for p in pats)


def test_c_whitespace_splitting(tmp_path):
    f = tmp_path / "p.txt"
    f.write_bytes(b"  foo\tbar\r\nbaz\x0b\x0cqux  foo\n")
    assert load_patterns(f) == [b"foo", b"bar", b"baz", b"qux", b"foo"]


def test_split_c_tokens_empty():
    assert split_c_tokens(b" \t\n ") == []


def test_long_pattern_rejected(tmp_path):
    f = tmp_path / "p.txt"
    f.write_bytes(b"a" * 100)
    with pytest.raises(ValueError):
        load_patterns(f)


def test_empty_file_rejected(tmp_path):
    f = tmp_path / "p.txt"
    f.write_bytes(b"")
    with pytest.raises(ValueError):
        load_patterns(f)
