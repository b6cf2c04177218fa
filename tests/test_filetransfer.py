"""S8/S9 file-mover semantics with fake clients (no servers — the
date/catch-up/filter logic is the part the reference encodes)."""

from __future__ import annotations

import datetime as dt

from ods_v3_dbt_spark.sources.filetransfer import (
    catchup_days,
    dated_filename,
    ftp_download_t_minus,
    sftp_fetch_dated,
)

DAY = dt.date(2024, 9, 15)


class FakeSFTP:
    def __init__(self, files):
        self.files = files
        self.fetched = []

    def listdir(self, path):
        return list(self.files)

    def get(self, remote, local):
        self.fetched.append(remote)
        with open(local, "wb") as fh:
            fh.write(b"x")


class FakeFTP:
    def __init__(self, files):
        self.files = files

    def nlst(self, path):
        return [f"{path}/{n}" for n in self.files]

    def retrbinary(self, cmd, cb):
        cb(b"data")


def test_dated_filename_token():
    assert dated_filename("detail_", DAY) == "detail_15092024.xlsx"


def test_catchup_skips_missing_days(tmp_path):
    # only T and T-2 exist remotely; T-1 missing → skipped silently
    client = FakeSFTP(
        {"detail_15092024.xlsx", "detail_13092024.xlsx", "unrelated.txt"}
    )
    got = sftp_fetch_dated(client, "/drop", tmp_path, "detail_", DAY, lookback=3)
    assert sorted(p.name for p in got) == [
        "detail_13092024.xlsx", "detail_15092024.xlsx"
    ]
    assert len(client.fetched) == 2
    assert catchup_days(DAY, 3)[-1] == dt.date(2024, 9, 12)


def test_ftp_t_minus_filter_and_clean(tmp_path):
    stale = tmp_path / "old.bin"
    stale.write_bytes(b"stale")
    client = FakeFTP(
        ["rpt_14092024_a.csv", "rpt_14092024_b.csv", "rpt_13092024.csv"]
    )
    got = ftp_download_t_minus(
        client, "/out", tmp_path, t_minus=1, today=DAY,
        name_filter=lambda n: n.endswith(".csv"),
    )
    assert sorted(p.name for p in got) == ["rpt_14092024_a.csv", "rpt_14092024_b.csv"]
    assert not stale.exists()  # local dir cleaned first
    assert got[0].read_bytes() == b"data"
