"""File-transfer ingestion utilities S8/S9 (SURVEY §2.1).

The reference moves dated Excel drops from SFTP into MinIO
(``plugins/operators/ftp_downloader.py:15-108``: filename
``{prefix}{ddmmyyyy}.xlsx``, existence check, multi-date catch-up
loop) and pulls T-minus-N files from FTP directories
(``plugins/hooks/custom_ftp_hook.py:43-86``). These are ingestion
plumbing, not query operators — kept as thin, client-injectable
helpers so the date/catch-up/filter logic (the actual semantics) is
unit-testable without a server. The SFTP client itself (paramiko in
the reference) is absent in this container; pass any object with
``listdir/get`` (S8) or ``nlst/retrbinary`` (S9).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable, Sequence
from pathlib import Path


def dated_filename(prefix: str, day: dt.date, suffix: str = ".xlsx") -> str:
    """``{prefix}{ddmmyyyy}{suffix}`` — the reference's drop naming
    (``ftp_downloader.py:69-75``; same token in
    ``pns_to_ods_optimize.py:65-67``)."""
    return f"{prefix}{day.strftime('%d%m%Y')}{suffix}"


def catchup_days(run_day: dt.date, lookback: int) -> list[dt.date]:
    """The multi-date catch-up loop: today back through
    T-``lookback`` (``ftp_downloader.py:84-98`` loops missed dates)."""
    return [run_day - dt.timedelta(days=i) for i in range(lookback + 1)]


def sftp_fetch_dated(
    client,
    remote_dir: str,
    local_dir: str | Path,
    prefix: str,
    run_day: dt.date,
    lookback: int = 0,
    suffix: str = ".xlsx",
) -> list[Path]:
    """S8: fetch each existing dated drop for the catch-up window.

    ``client`` needs ``listdir(path) -> list[str]`` and
    ``get(remote, local)`` (paramiko-SFTP shaped). Missing dates are
    skipped, matching the reference's existence check
    (``ftp_downloader.py:77-83``).
    """
    local = Path(local_dir)
    local.mkdir(parents=True, exist_ok=True)
    available = set(client.listdir(remote_dir))
    fetched: list[Path] = []
    for day in catchup_days(run_day, lookback):
        name = dated_filename(prefix, day, suffix)
        if name not in available:
            continue
        dest = local / name
        client.get(f"{remote_dir.rstrip('/')}/{name}", str(dest))
        fetched.append(dest)
    return fetched


def ftp_download_t_minus(
    client,
    remote_dir: str,
    local_dir: str | Path,
    t_minus: int = 1,
    today: dt.date | None = None,
    name_filter: Callable[[str], bool] | None = None,
    clean_local: bool = True,
) -> list[Path]:
    """S9: download every file whose name contains the T-minus-N date
    token, cleaning the local dir first (``custom_ftp_hook.py:43-86``).

    ``client`` needs ``nlst(dir) -> list[str]`` and
    ``retrbinary(cmd, callback)`` (stdlib ``ftplib.FTP`` shaped).
    """
    local = Path(local_dir)
    if clean_local and local.exists():
        for p in local.iterdir():
            if p.is_file():
                p.unlink()
    local.mkdir(parents=True, exist_ok=True)
    day = (today or dt.date.today()) - dt.timedelta(days=t_minus)
    token = day.strftime("%d%m%Y")
    names: Sequence[str] = client.nlst(remote_dir)
    got: list[Path] = []
    for name in names:
        base = name.rsplit("/", 1)[-1]
        if token not in base:
            continue
        if name_filter is not None and not name_filter(base):
            continue
        dest = local / base
        with open(dest, "wb") as fh:
            client.retrbinary(f"RETR {name}", fh.write)
        got.append(dest)
    return got
