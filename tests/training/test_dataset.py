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
