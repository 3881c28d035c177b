"""SSIM E2E regression suite config (reference analog:
fastvideo/tests/ssim/conftest.py — optional model filtering via
FASTVIDEO_SSIM_MODEL_ID)."""

import os

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "real_ckpt: needs real weights (env-gated; skips loudly without)")


def pytest_collection_modifyitems(config, items):
    wanted = os.getenv("FASTVIDEO_SSIM_MODEL_ID")
    if not wanted:
        return
    skip = pytest.mark.skip(
        reason=f"filtered out by FASTVIDEO_SSIM_MODEL_ID={wanted}")
    for item in items:
        if wanted not in item.nodeid:
            item.add_marker(skip)
