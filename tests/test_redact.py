"""redact_pii: unit behavior + engine-vs-DuckDB parity on planted PII
(the sf testdata contains no natural PII, so parity there is vacuous —
this plants emails/IPs/phones and runs the REAL queries() callable)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def test_redact_pii_unit():
    from raydedup.textstats import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "contact bob.smith+spam@ex-a.co.uk today",
                    "server at 192.168.0.1 rebooted",
                    "call 555-867-5309 or +4915112345678",
                    None,
                    "no pii here, just 3.14 and v1.2",
                ]
            ),
        }
    )
    out = redact_pii(t).to_pydict()
    assert out["redacted"][0] == "contact <EMAIL> today"
    assert out["redacted"][1] == "server at <IP> rebooted"
    assert out["redacted"][2] == "call <PHONE> or <PHONE>"
    assert out["redacted"][3] == ""  # NULL → ''
    # 3.14 / v1.2 must survive (not IP/phone shaped)
    assert out["redacted"][4] == "no pii here, just 3.14 and v1.2"
    assert out["has_pii"] == [True, True, True, False, False]


def test_redact_pii_oracle_parity_planted(tmp_path, ray_session):
    import __ray_entry__ as entry

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array(
                [
                    "x a@b.io y",
                    "ip 10.0.0.255, then 1.2.3.4.",
                    "tel 123-456-7890 and 123.456.7890",
                    "+123456789 leading plus",
                    "",
                    None,
                ]
            ),
        }
    )
    sf = tmp_path / "sfpii"
    sf.mkdir()
    pq.write_table(tbl, sf / "documents.parquet")

    got = entry.queries()["redact_pii"](str(sf)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(entry.oracle_sql()["redact_pii"]).df()
    con.close()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    assert got["has_pii"].tolist() == [True, True, True, True, False, False]
