"""Storage-backend edge cases found by review.

1. A SQLiteStorage handle constructed BEFORE the tables exist (the
   documented shared-DB worker pattern: a worker process starting while the
   builder's --process is still creating the schema) must re-resolve the
   schema lazily in claim_jobs / write_results, like is_empty /
   read_generations / read_runnable already did - not render permanently
   malformed SQL from the empty column list.
2. claim_jobs(posterior_req=k) with NO posterior-ranked set must return an
   empty claim on EVERY backend (the SQLite subquery is NULL then and
   selects nothing); MemoryStorage used to raise StorageError instead.
"""

import numpy as np

from abcsmc_tpu.storage import MemoryStorage, SQLiteStorage


def _populate(path_or_store):
    st = (
        SQLiteStorage(str(path_or_store))
        if not isinstance(path_or_store, MemoryStorage) else path_or_store
    )
    st.create(["p1", "p2"], ["m1"], False)
    st.insert_generation(0, np.arange(8.0).reshape(4, 2),
                         np.arange(4, dtype=np.uint64))
    return st


def test_claim_and_writeback_on_pre_tables_handle(tmp_path):
    db = tmp_path / "late.sqlite"
    early = SQLiteStorage(str(db))          # file exists, no tables yet
    assert early.par_names == []
    _populate(db).close()                   # another handle creates + enqueues

    claimed = early.claim_jobs(n=2)
    assert claimed.serials.tolist() == [0, 1]
    assert claimed.params.shape == (2, 2)
    np.testing.assert_array_equal(claimed.params[1], [2.0, 3.0])

    n = early.write_results(
        claimed.serials, np.array([[7.0], [8.0]]), [0, 0], [0.1, 0.1]
    )
    assert n == 2
    gens = early.read_generations()
    assert gens[0].statuses.tolist() == ["D", "D", "Q", "Q"]
    assert gens[0].metrics[1, 0] == 8.0
    early.close()


def test_posterior_claim_before_any_ranked_set_is_empty(tmp_path):
    sql = _populate(tmp_path / "post.sqlite")
    mem = _populate(MemoryStorage())
    for st in (sql, mem):
        claimed = st.claim_jobs(posterior_req=0)
        assert claimed.serials.size == 0, type(st).__name__
        assert claimed.params.shape[0] == 0
    # once a rank exists, both backends claim the ranked row
    for st in (sql, mem):
        st.write_posterior_ranks([1], [0])
        claimed = st.claim_jobs(posterior_req=0)
        assert claimed.serials.tolist() == [1], type(st).__name__
    sql.close()
