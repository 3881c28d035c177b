"""Reference-video store for SSIM E2E regression gating.

Analog of /root/reference/fastvideo/tests/ssim/reference_videos_cli.py +
reference_utils.py: per-device-type reference folders, a manifest with
content hashes, and management verbs (fetch / verify / copy-local / list).

Layout (root = $FASTVIDEO_SSIM_REFS, default
~/.cache/fastvideo_tpu/ssim_refs):

    <root>/<quality_tier>/<device_key>_reference_videos/
        <case_name>.npy          # [T, H, W, 3] uint8 frames
        manifest.json            # {case_name: {"sha256":…, "shape":…}}

Frames are stored as .npy (this box has no ffmpeg backend; the reference
stores mp4 on HF — the CLI accepts .mp4 too when imageio can decode it).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Any

import numpy as np

DEFAULT_TIER = "fast"


def store_root() -> str:
    return os.path.expanduser(
        os.getenv("FASTVIDEO_SSIM_REFS",
                  "~/.cache/fastvideo_tpu/ssim_refs"))


def device_key() -> str:
    """Stable key for the accelerator generating/validating references
    (reference analog: per-GPU reference folders, e.g.
    L40S_reference_videos). Overridable for cross-device comparisons."""
    forced = os.getenv("FASTVIDEO_SSIM_DEVICE_KEY")
    if forced:
        return forced
    try:
        import jax

        kind = jax.devices()[0].device_kind.replace(" ", "_")
    except Exception:
        kind = "cpu"
    return kind


def reference_dir(tier: str = DEFAULT_TIER, key: str | None = None) -> str:
    return os.path.join(store_root(), tier,
                        f"{key or device_key()}_reference_videos")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for block in iter(lambda: fh.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _manifest_path(ref_dir: str) -> str:
    return os.path.join(ref_dir, "manifest.json")


def load_manifest(ref_dir: str) -> dict[str, Any]:
    p = _manifest_path(ref_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return json.load(fh)


def load_reference(case_name: str, tier: str = DEFAULT_TIER,
                   key: str | None = None) -> np.ndarray | None:
    """[T, H, W, 3] uint8 reference frames, or None when absent."""
    ref_dir = reference_dir(tier, key)
    npy = os.path.join(ref_dir, f"{case_name}.npy")
    if os.path.exists(npy):
        return np.load(npy)
    mp4 = os.path.join(ref_dir, f"{case_name}.mp4")
    if os.path.exists(mp4):
        try:
            import imageio.v3 as iio

            return np.asarray(iio.imread(mp4, plugin="pyav"))
        except Exception:
            return None
    return None


def copy_local(src: str, case_name: str, tier: str = DEFAULT_TIER,
               key: str | None = None) -> str:
    """Install a locally generated output (.npy frames) as the reference
    for ``case_name`` and update the manifest (reference CLI verb
    ``copy-local``)."""
    frames = np.load(src) if isinstance(src, str) else np.asarray(src)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected [T,H,W,3] frames, got {frames.shape}")
    ref_dir = reference_dir(tier, key)
    os.makedirs(ref_dir, exist_ok=True)
    dst = os.path.join(ref_dir, f"{case_name}.npy")
    np.save(dst, frames.astype(np.uint8))
    manifest = load_manifest(ref_dir)
    manifest[case_name] = {
        "sha256": _sha256(dst),
        "shape": list(frames.shape),
        "dtype": "uint8",
    }
    with open(_manifest_path(ref_dir), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return dst


@dataclass
class VerifyResult:
    ok: list[str]
    corrupt: list[str]
    missing: list[str]
    untracked: list[str]


_REF_EXTS = (".npy", ".mp4")  # copy-local writes .npy; fetch pulls .mp4


def _case_path(ref_dir: str, case: str) -> str | None:
    for ext in _REF_EXTS:
        p = os.path.join(ref_dir, f"{case}{ext}")
        if os.path.exists(p):
            return p
    return None


def verify(tier: str = DEFAULT_TIER, key: str | None = None) -> VerifyResult:
    """Check every manifest entry's hash and report drift. Fetched sets
    (mp4, no local manifest yet) verify by existence; hashed entries by
    sha256."""
    ref_dir = reference_dir(tier, key)
    manifest = load_manifest(ref_dir)
    ok, corrupt, missing = [], [], []
    for case, meta in manifest.items():
        path = _case_path(ref_dir, case)
        if path is None:
            missing.append(case)
        elif meta.get("sha256") and _sha256(path) != meta["sha256"]:
            corrupt.append(case)
        else:
            ok.append(case)
    tracked = {f"{c}{ext}" for c in manifest for ext in _REF_EXTS}
    untracked = [
        f for f in (os.listdir(ref_dir) if os.path.isdir(ref_dir) else [])
        if f.endswith(_REF_EXTS) and f not in tracked
    ]
    return VerifyResult(ok, corrupt, missing, untracked)


def fetch(repo_id: str = "FastVideo/ssim-reference-videos",
          tier: str = DEFAULT_TIER, key: str | None = None) -> str:
    """Download the reference set from a HF dataset repo (the reference
    stores its videos at FastVideo/ssim-reference-videos). Requires
    network egress; raises a clear error when the hub is unreachable."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("huggingface_hub is required for fetch") from exc
    sub = f"{tier}/{key or device_key()}_reference_videos"
    try:
        path = snapshot_download(repo_id, repo_type="dataset",
                                 allow_patterns=[f"{sub}/*"],
                                 local_dir=store_root())
    except Exception as exc:
        raise RuntimeError(
            f"could not fetch {repo_id}:{sub} — this machine may have no "
            f"egress; place files under {reference_dir(tier, key)} manually "
            f"and run `fastvideo eval refs verify`") from exc
    return path


def write_ssim_results(out_dir: str, case_name: str,
                       results: dict[str, Any]) -> str:
    """Persist per-case scores next to generated outputs (reference
    analog: write_ssim_results in inference_similarity_utils.py)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{case_name}_ssim.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    return path
