"""Golden dataset C — the finality planning kernel.

16 cases from the reference's table-driven test
(tests/test_smalltsdb.py:85-118), times written as m:ss.
"""

import pytest

from smalltsdb_spark.intervals import bucket_start, intervals


def t(spec: str) -> int:
    m, s = spec.split(":")
    return int(m) * 60 + int(s)


CASES = [
    # (seconds, tail, now, last_final, final, partial)
    (10, 30, "1:42", "0:30", ("0:40", "1:10"), ("1:10", "1:50")),
    (10, 30, "1:42", "0:50", ("1:00", "1:10"), ("1:10", "1:50")),
    (10, 30, "1:42", "1:00", ("1:10", "1:10"), ("1:10", "1:50")),
    (10, 30, "1:49", "1:00", ("1:10", "1:10"), ("1:10", "1:50")),
    (10, 30, "1:50", "1:00", ("1:10", "1:20"), ("1:20", "2:00")),
    (60, 30, "1:42", "0:00", ("1:00", "1:00"), ("1:00", "2:00")),
    (60, 30, "1:59", "0:00", ("1:00", "1:00"), ("1:00", "2:00")),
    (60, 30, "2:00", "0:00", ("1:00", "1:00"), ("1:00", "3:00")),
    (60, 30, "2:29", "0:00", ("1:00", "1:00"), ("1:00", "3:00")),
    (60, 30, "2:30", "0:00", ("1:00", "2:00"), ("2:00", "3:00")),
    (60, 30, "2:30", "1:00", ("2:00", "2:00"), ("2:00", "3:00")),
    (300, 60, "24:59", "0:00", ("5:00", "20:00"), ("20:00", "25:00")),
    (300, 60, "24:59", "15:00", ("20:00", "20:00"), ("20:00", "25:00")),
    (300, 60, "25:00", "15:00", ("20:00", "20:00"), ("20:00", "30:00")),
    (300, 60, "25:59", "15:00", ("20:00", "20:00"), ("20:00", "30:00")),
    (300, 60, "26:00", "15:00", ("20:00", "25:00"), ("25:00", "30:00")),
]


@pytest.mark.parametrize("seconds,tail,now,last_final,final,partial", CASES)
def test_intervals_golden(seconds, tail, now, last_final, final, partial):
    got = intervals(seconds, tail, t(now), t(last_final))
    assert got == ((t(final[0]), t(final[1])), (t(partial[0]), t(partial[1])))


def test_intervals_none_last_final():
    # last_final=None is treated as -period => final starts at bucket 0.
    (fs, _), _ = intervals(10, 30, 102, None)
    assert fs == 0


def test_bucket_start_floor_semantics():
    assert bucket_start(12.9, 10) == 10
    assert bucket_start(10.0, 10) == 10
    assert bucket_start(9.999, 10) == 0
    # documented divergence from SQLite truncation: floor for negatives
    assert bucket_start(-1.0, 10) == -10
