from __future__ import annotations

import pytest

from kgspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgspark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def triple_set(df):
    """Collect a triples DataFrame into the golden tuple-set form."""
    return {
        (r.subj, r.pred, r.obj, r.obj_kind, r.obj_dtype, r.obj_lang)
        for r in df.collect()
    }
