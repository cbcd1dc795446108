"""Multi-host helpers (single-process degradation + shard arithmetic)."""
import numpy as np

from wfa_tpu.parallel.distributed import host_shard, initialize


def test_initialize_single_process_noop():
    initialize()  # must not raise without a coordinator


def test_host_shard_strided_partition():
    n, nproc = 103, 8
    shards = [host_shard(n, pid, nproc) for pid in range(nproc)]
    allidx = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(allidx, np.arange(n))
    # Strided: every shard sees the same length mix (consecutive global
    # indices land on different hosts).
    assert shards[0][1] == nproc
