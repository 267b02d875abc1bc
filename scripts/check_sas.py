#!/usr/bin/env python3
"""Cross-validate SasWriter fixtures against pandas.read_sas.

The repo's SAS7BDAT reader (graft.sources.Sas7bdat) is tested against
fixtures produced by the test-only writer (graft.testing.SasWriter).
Writer and reader are written by the same authors, so they could in
principle share a misunderstanding of the format; this script breaks
that circularity by parsing the same fixture with pandas' independent
sas7bdat implementation and asserting the decoded values.

Usage:
    sbt "Test/runMain graft.testing.SasWriterMain /tmp/fix.sas7bdat"
    python3 scripts/check_sas.py /tmp/fix.sas7bdat
"""
import math
import sys

import pandas as pd

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fix.sas7bdat"
df = pd.read_sas(path, format="sas7bdat", encoding="utf-8")

assert df.shape == (500, 4), df.shape
assert list(df.columns) == ["id", "ret", "evtdate", "ticker"], list(df.columns)
assert df["id"].tolist() == [float(i) for i in range(500)]
for i in range(500):
    r = df["ret"].iloc[i]
    if i % 7 == 3:
        assert math.isnan(r), (i, r)
    else:
        assert abs(r - (i * 0.25 - 10)) < 1e-12, (i, r)
    t = df["ticker"].iloc[i]
    if i % 11 == 5:
        assert (isinstance(t, float) and math.isnan(t)) or t in (None, ""), (i, repr(t))
    else:
        assert t == f"T{i % 97}", (i, t)
assert str(df["evtdate"].iloc[0])[:10] == "2000-01-01"
assert str(df["evtdate"].iloc[499])[:10] == "2001-05-14"
print("PANDAS CROSS-VALIDATION: ALL OK")
