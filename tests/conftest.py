import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_zoomcamp_projects_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

_SHIM_SRC = (
    Path(__file__).parent.parent / "java_shims" / "sparkgraft" / "S3ALocalShim.java"
)


def _build_s3a_shim() -> str | None:
    """Compile the s3a-on-localfs test shim (see java_shims/) so the
    object-store sink can be exercised end-to-end. Returns the classes
    dir, or None when no JDK / hadoop jar is available (s3a tests then
    skip)."""
    javac = shutil.which("javac")
    if javac is None or not _SHIM_SRC.exists():
        return None
    try:
        import pyspark

        hadoop = sorted((Path(pyspark.__file__).parent / "jars").glob(
            "hadoop-client-api*.jar"
        ))
        if not hadoop:
            return None
        out = tempfile.mkdtemp(prefix="s3a_shim_classes_")
        r = subprocess.run(
            [javac, "-cp", str(hadoop[0]), "-d", out, str(_SHIM_SRC)],
            capture_output=True,
            timeout=120,
        )
        return out if r.returncode == 0 else None
    except Exception:
        return None


_S3A_SHIM_DIR = _build_s3a_shim()


@pytest.fixture(scope="session")
def spark():
    extra = {}
    if _S3A_SHIM_DIR:
        # extraClassPath must be set before the JVM launches, so the
        # shim rides on the shared session; other tests are unaffected
        # (nothing else touches s3a://)
        extra = {
            "spark.driver.extraClassPath": _S3A_SHIM_DIR,
            "spark.hadoop.fs.s3a.impl": "sparkgraft.S3ALocalShim",
        }
    s = get_spark(master="local[8]", shuffle_partitions=8, extra_conf=extra)
    yield s


@pytest.fixture(scope="session")
def s3a_shim(spark):
    if not _S3A_SHIM_DIR:
        pytest.skip("no JDK available to build the s3a-on-localfs shim")
    return "s3a://test-bucket"


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", SF_SMOKE)


@pytest.fixture(scope="session")
def pg_server():
    """Throwaway Postgres 15 (initdb + pg_ctl as the postgres user,
    unix socket only). No JDBC driver jar exists in this sandbox (see
    COVERAGE.md), so Spark cannot speak to it — the server validates
    the POSTGRES DIALECT of generated DDL/SQL via psql. Skips where the
    server binaries or the postgres user are unavailable."""
    import glob
    import pwd

    bins = sorted(glob.glob("/usr/lib/postgresql/*/bin"))
    psql = shutil.which("psql")
    try:
        pwd.getpwnam("postgres")
    except KeyError:
        pytest.skip("no postgres user")
    if not bins or psql is None or os.geteuid() != 0:
        pytest.skip("no postgres server binaries (or not root for su)")
    pgbin, port = bins[-1], "54329"
    base = tempfile.mkdtemp(prefix="pgtest_")
    os.chmod(base, 0o777)
    data = os.path.join(base, "data")
    shutil.chown(base, "postgres", "postgres")

    def as_pg(cmd: str):
        return subprocess.run(
            ["su", "postgres", "-s", "/bin/bash", "-c", f"cd /tmp && {cmd}"],
            capture_output=True,
            timeout=120,
        )

    r = as_pg(f"{pgbin}/initdb -D {data} -A trust")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr.decode()[-200:]}")
    r = as_pg(
        f"{pgbin}/pg_ctl -D {data} -o '-k {base} -p {port} -c listen_addresses=' "
        f"-l {base}/pg.log start"
    )
    if r.returncode != 0:
        pytest.skip(f"pg_ctl failed: {r.stderr.decode()[-200:]}")
    yield {"host": base, "port": port, "psql": psql}
    as_pg(f"{pgbin}/pg_ctl -D {data} stop -m immediate")
