"""Parquet dataset roundtrip + sampler determinism."""

import numpy as np


def test_parquet_roundtrip_and_loader(tmp_path):
    from fastvideo_tpu.dataset.parquet import (build_parquet_dataloader,
                                               record_from_sample,
                                               write_parquet_dataset)

    rng = np.random.default_rng(0)
    records = []
    for i in range(8):
        lat = rng.standard_normal((4, 2, 4, 4)).astype(np.float32)
        txt = rng.standard_normal((6, 16)).astype(np.float32)
        records.append(
            record_from_sample(f"s{i}", lat, txt, caption=f"cap {i}",
                               width=32, height=32, num_frames=5))
    write_parquet_dataset(records, str(tmp_path), rows_per_file=3)

    loader = build_parquet_dataloader(str(tmp_path), batch_size=2, accum=2,
                                      seed=7)
    lat, txt = next(loader)
    assert lat.shape == (2, 2, 4, 2, 4, 4)
    assert txt.shape == (2, 2, 6, 16)

    # determinism at same seed
    loader2 = build_parquet_dataloader(str(tmp_path), batch_size=2, accum=2,
                                       seed=7)
    lat2, txt2 = next(loader2)
    np.testing.assert_array_equal(lat, lat2)
    np.testing.assert_array_equal(txt, txt2)


def test_dp_sampler_disjoint():
    from fastvideo_tpu.dataset.parquet import DPSPBatchSampler

    s0 = DPSPBatchSampler(32, 4, num_dp_groups=2, dp_group_rank=0, seed=1)
    s1 = DPSPBatchSampler(32, 4, num_dp_groups=2, dp_group_rank=1, seed=1)
    b0 = next(iter(s0))
    b1 = next(iter(s1))
    assert not set(b0) & set(b1)


def test_prefetching_loader_overlap_and_resume(tmp_path):
    """Prefetch thread decodes ahead; state_dict resume replays the exact
    next batch (the reference's StatefulDataLoader semantics)."""
    import numpy as np

    from fastvideo_tpu.dataset.loader import PrefetchingLoader
    from fastvideo_tpu.dataset.parquet import DPSPBatchSampler

    data = np.arange(64, dtype=np.float32)
    sampler = DPSPBatchSampler(64, 4, 1, 0, seed=7)
    decoded = []

    def make_batch(indices):
        decoded.append(list(indices))
        return data[np.asarray(indices)]

    loader = PrefetchingLoader(sampler, make_batch, prefetch=2)
    first = [next(loader) for _ in range(5)]
    state = loader.state_dict()
    # prefetch ran ahead of consumption
    import time
    time.sleep(0.2)
    assert len(decoded) >= 5

    # a fresh loader resumed from state continues with batch 6
    sampler2 = DPSPBatchSampler(64, 4, 1, 0, seed=7)
    loader2 = PrefetchingLoader(sampler2, make_batch, prefetch=2)
    loader2.load_state_dict(state)
    nxt = next(loader2)

    sampler3 = DPSPBatchSampler(64, 4, 1, 0, seed=7)
    reference = []
    it = iter(sampler3)
    for _ in range(6):
        reference.append(data[np.asarray(next(it))])
    np.testing.assert_array_equal(nxt, reference[5])
    for got, want in zip(first, reference[:5]):
        np.testing.assert_array_equal(got, want)
    loader.shutdown()
    loader2.shutdown()
