"""Unit coverage for T142 training_shuffle — local brute-force rank
recomputation plus shuffle-contract properties (per-shard positions
are a dense 0..n-1 permutation; the assignment is a bijection over
doc_ids; determinism across runs)."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_training_shuffle_matches_bruteforce(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (Q.q_training_shuffle(SF).to_pandas()
           .sort_values(["shard", "pos"]).reset_index(drop=True))
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    k = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(2**32)
    shard = (k % np.uint64(Q.TRAIN_SHARDS)).astype(np.int64)
    assert len(got) == len(ids)
    assert sorted(got["doc_id"]) == sorted(ids.tolist())  # bijection
    for s in range(Q.TRAIN_SHARDS):
        sub = got[got["shard"] == s]
        m = shard == s
        want = ids[m][np.lexsort((ids[m], k[m]))]
        assert sub["pos"].tolist() == list(range(len(want)))  # dense
        assert sub["doc_id"].tolist() == want.tolist()
    # determinism: a second run is byte-identical
    again = (Q.q_training_shuffle(SF).to_pandas()
             .sort_values(["shard", "pos"]).reset_index(drop=True))
    assert again.equals(got)
