"""Timestamp parsing parity with the reference
(itext2kg/atom/atom.py:111-134, relationship.py:38-72)."""

from dateutil import parser as duparser

from kgray.functions.timeparse import TimestampParser, parse_timestamp


def test_valid_dates():
    p = TimestampParser()
    for s in ["2020-01-05", "March 4, 2021", "2021-03-04T10:00:00", "01/02/2023"]:
        assert p.parse_one(s) == duparser.parse(s).timestamp()


def test_invalid_dates_skipped_silently():
    p = TimestampParser()
    assert p.parse_list(["2020-01-05", "an-unknown-date", "not a date at all ###"]) == [
        duparser.parse("2020-01-05").timestamp()
    ]
    assert parse_timestamp("an-unknown-date") is None


def test_empty_and_none():
    p = TimestampParser()
    assert p.parse_list([]) == []
    assert p.parse_list(None) == []
    assert p.parse_list([None]) == []
