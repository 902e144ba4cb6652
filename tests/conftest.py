import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "/root/repo")

from crba_etl_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="crba_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def make_events(spark, rows, with_tool=True):
    """rows: list of (lsn, epoch, op, conv_id, turn_idx, role, text, tool, ts_s, ingest_s)"""
    import datetime as dt

    from crba_etl_spark.schema import CHANGE_EVENT, CHANGE_EVENT_V0

    base = dt.datetime(2025, 1, 1)
    data = []
    for lsn, epoch, op, cid, tix, role, text, tool, ts_s, ing_s in rows:
        rec = [
            lsn,
            epoch,
            op,
            cid,
            tix,
            role,
            text,
        ]
        if with_tool:
            rec.append(tool)
        rec += [
            base + dt.timedelta(seconds=ts_s) if ts_s is not None else None,
            base + dt.timedelta(seconds=ing_s) if ing_s is not None else None,
        ]
        data.append(tuple(rec))
    schema = CHANGE_EVENT if with_tool else CHANGE_EVENT_V0
    return spark.createDataFrame(data, schema)
