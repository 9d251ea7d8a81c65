from __future__ import annotations

from scabillmatch_spark.operators import latest_version as LV


def test_latest_versions_window(spark):
    meta = spark.createDataFrame(
        [
            ("bills/FL/2005/SB436/SB436_Introduced.txt", "January 5, 2005", "Introduced"),
            ("bills/FL/2005/SB436/SB436_Amended.txt", "March 12, 2005", "Amended"),
            ("bills/FL/2005/SB436/SB436_Enacted.txt", "April 2, 2005", "Enacted"),
            # same date: priority must break the tie (Enrolled beats Amended)
            ("bills/MI/2005/HB1/HB1_Amended.txt", "June 1, 2005", "Amended"),
            ("bills/MI/2005/HB1/HB1_Enrolled.txt", "June 1, 2005", "Enrolled"),
            # malformed date falls back to 1900 and loses
            ("bills/SC/2005/HB2/HB2_Enacted.txt", "not a date", "Enacted"),
            ("bills/SC/2005/HB2/HB2_Introduced.txt", "May 20, 2005", "Introduced"),
        ],
        ["filePath", "versionDate", "version"],
    )
    latest = {r.family: r.version for r in LV.latest_versions(meta).collect()}
    assert latest["SB436"] == "Enacted"
    assert latest["HB1"] == "Enrolled"
    assert latest["HB2"] == "Introduced"


def test_attach_latest_semi_join(spark):
    meta = spark.createDataFrame(
        [
            ("bills/FL/2005/SB436/SB436_Introduced.txt", "January 5, 2005", "Introduced"),
            ("bills/FL/2005/SB436/SB436_Enacted.txt", "April 2, 2005", "Enacted"),
        ],
        ["filePath", "versionDate", "version"],
    )
    bills = spark.createDataFrame(
        [("SB436_Introduced", "old text"), ("SB436_Enacted", "new text")],
        ["primary_key", "content"],
    )
    kept = LV.attach_latest(bills, meta).collect()
    assert len(kept) == 1 and kept[0].primary_key == "SB436_Enacted"