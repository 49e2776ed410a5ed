"""S4 labs-CSV source tests: coercing date parse, try-cast analytes,
absent-column tolerance, synthetic monthly dates, and compatibility with
the scoring layer."""

from __future__ import annotations

from healthcare_aws_data_engineering_spark.plans.wellness import score_rows
from healthcare_aws_data_engineering_spark.sources.labs import read_labs_csv


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_read_labs_csv_coercion(spark, tmp_path):
    p = _write(
        tmp_path,
        "labs.csv",
        "date,patient_id,LDL,HDL,notes\n"
        "2024-01-15,p1,130.5,45,ok\n"
        "not-a-date,p1,oops,50,bad\n"
        "2024-03-15,p2,,60,\n",
    )
    df = read_labs_csv(spark, p)
    rows = {(r.patient_id, i): r for i, r in enumerate(df.collect())}
    out = df.collect()
    assert df.schema["date"].dataType.typeName() == "timestamp"
    assert df.schema["LDL"].dataType.typeName() == "double"
    by_note = {r.notes: r for r in out}
    assert by_note["bad"].date is None  # coerced, not failed
    assert by_note["bad"].LDL is None  # try-cast
    assert by_note["ok"].LDL == 130.5
    assert by_note["ok"].notes == "ok"  # extra columns pass through


def test_read_labs_csv_synthetic_dates(spark, tmp_path):
    p = _write(
        tmp_path,
        "labs2.csv",
        "patient_id,LDL\np1,100\np1,110\np1,120\np2,90\n",
    )
    df = read_labs_csv(spark, p)
    assert "date" in df.columns
    p1 = sorted(
        r.date for r in df.filter("patient_id = 'p1'").collect()
    )
    assert len(p1) == 3 and p1[0].month == 1 and p1[2].month == 3
    assert all(d.day == 1 for d in p1)


def test_labs_csv_feeds_scoring(spark, tmp_path):
    p = _write(
        tmp_path,
        "labs3.csv",
        "date,patient_id,LDL,HDL,GlucoseBlood\n"
        "2024-01-15,p1,165,35,120\n",
    )
    scored = score_rows(read_labs_csv(spark, p)).collect()
    assert len(scored) == 1
    r = scored[0]
    assert r.subscore_cardiovascular is not None
    assert 0 <= r.subscore_cardiovascular <= 100
    assert r.wellness is not None
