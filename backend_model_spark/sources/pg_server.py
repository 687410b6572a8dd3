"""Ephemeral local Postgres cluster for the warehouse-sink roundtrip.

The reference's production sink is a Postgres table (reference
``pipeline.py:18-22``); ``io_jdbc_roundtrip`` proves the JDBC/Derby
path and this module proves the REAL Postgres path wherever the server
binaries exist: initdb a throwaway cluster, serve on a private unix
socket (no TCP, trust auth — the cluster lives only for the query),
and tear it down afterwards.

Root containers can't run initdb directly (Postgres refuses root), so
when running as uid 0 every server command is wrapped in
``runuser -u postgres``; the socket/data dir is chowned accordingly.
On a real deployment the engine would instead point
``PgConnection(host, user, db)`` at the warehouse endpoint — the
lifecycle here exists purely to make the sink testable hermetically.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import time

from backend_model_spark.sources.pg_wire import PgConnection


def postgres_available() -> bool:
    if not (shutil.which("initdb") and shutil.which("pg_ctl")):
        return False
    if os.geteuid() == 0:
        return shutil.which("runuser") is not None
    return True


class PostgresCluster:
    """Context manager: ``with PostgresCluster() as cl:`` yields an
    object with ``socket_dir`` and a ``connect()`` helper."""

    USER = "sparkgraft"
    DB = "postgres"

    def __init__(self):
        self.tmp = None
        self.socket_dir = None

    def _run(self, *cmd: str):
        if os.geteuid() == 0:
            cmd = ("runuser", "-u", "postgres", "--") + cmd
        subprocess.run(
            cmd, check=True, stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT
        )

    def __enter__(self):
        self.tmp = tempfile.mkdtemp(prefix="pgsink_")
        if os.geteuid() == 0:
            shutil.chown(self.tmp, "postgres", "postgres")
        data = os.path.join(self.tmp, "data")
        self._run("initdb", "-D", data, "-A", "trust", "-U", self.USER)
        self._run(
            "pg_ctl", "-D", data, "-w",
            "-o", f"-c listen_addresses='' -c unix_socket_directories={self.tmp}",
            "-l", os.path.join(self.tmp, "log"), "start",
        )
        self.socket_dir = self.tmp
        deadline = time.monotonic() + 15
        while True:
            try:
                self.connect().close()
                return self
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)

    def connect(self) -> PgConnection:
        return PgConnection(self.socket_dir, self.USER, self.DB)

    def __exit__(self, *exc):
        try:
            self._run("pg_ctl", "-D", os.path.join(self.tmp, "data"), "-m", "fast", "stop")
        finally:
            shutil.rmtree(self.tmp, ignore_errors=True)
