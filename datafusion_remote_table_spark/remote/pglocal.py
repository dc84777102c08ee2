"""Throwaway local PostgreSQL clusters for live integration/bench runs.

The container ships PostgreSQL server binaries (no Python driver — see
pgwire.py); this helper boots a private-port trust-auth cluster the way
the reference's integration-tests spin their dockerized servers, so the
postgres dialect can be exercised over a real wire. postgres refuses to
run as root, so under root every server command runs via ``su
postgres``. Returns None (never raises) when the environment can't run
a server — callers fall back or skip.
"""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import tempfile


def _run_server_cmd(cmd: str) -> subprocess.CompletedProcess:
    if os.geteuid() == 0:
        # cd / first: su's target user usually cannot read root's cwd
        return subprocess.run(
            ["su", "postgres", "-c", f"cd / && {cmd}"], capture_output=True, text=True
        )
    return subprocess.run(["bash", "-c", cmd], capture_output=True, text=True)


def start_local_postgres(prefix: str = "dfrt_pg_"):
    """Boot a throwaway cluster; returns (PostgresConnectionOptions,
    stop_fn) or None when server binaries / the postgres user are
    unavailable."""
    if shutil.which("initdb") is None or shutil.which("pg_ctl") is None:
        return None
    work = tempfile.mkdtemp(prefix=prefix)
    if os.geteuid() == 0:
        try:
            shutil.chown(work, user="postgres", group="postgres")
        except (LookupError, PermissionError):
            shutil.rmtree(work, ignore_errors=True)
            return None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    data = os.path.join(work, "data")
    if _run_server_cmd(f"initdb -D {data} -U dfrt -A trust").returncode != 0:
        shutil.rmtree(work, ignore_errors=True)
        return None
    r = _run_server_cmd(
        f"pg_ctl -D {data} -o '-p {port} -c listen_addresses=127.0.0.1 -k {work}' "
        f"-l {work}/pg.log -w start"
    )
    if r.returncode != 0:
        shutil.rmtree(work, ignore_errors=True)
        return None

    def stop():
        _run_server_cmd(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(work, ignore_errors=True)

    from .options import PostgresConnectionOptions

    return (
        PostgresConnectionOptions(
            host="127.0.0.1", port=port, username="dfrt", database="postgres"
        ),
        stop,
    )
