"""Compile-cache contract: fail fast-and-loud instead of silently stalling.

A cold full-network compile of the block-engine describe program is
expensive (tens of minutes on a small CPU host). The persistent
``.jax_cache`` makes warm runs cheap, but any drift in the fields that
shape the traced HLO (block capacities, rotation chunking, backbone
variant, payload layout) silently reintroduces the stall.

This module keeps a tiny manifest of describe-program signatures known to
be present in the persistent cache. Entry points (bench.py,
validate_quality.py) call :func:`check_describe_signature` before the
first dispatch: a known signature proceeds silently, an unknown one prints
an immediate, informative warning with the expected compile cost (VERDICT
r2 'next' item #6) and is recorded once the run survives to completion via
:func:`record_describe_signature`.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

__all__ = [
    "describe_signature",
    "check_describe_signature",
    "record_describe_signature",
]

_MANIFEST = "describe_manifest.json"


def describe_signature(cfg, extra: dict | None = None) -> str:
    """Stable hash of every config field that shapes the describe HLO."""
    payload = {
        # bump when the traced program structure changes without a config
        # field changing (e.g. round 4: whole-cloud payload as chunk ROWS +
        # dynamic-row-index chunk program replaced the per-chunk payloads)
        "layout_rev": 3,
        "engine": cfg.engine,
        "block_caps": list(cfg.block_caps),
        "block_caps_fallback": (
            list(cfg.block_caps_fallback) if cfg.block_caps_fallback else None
        ),
        "capacities": list(cfg.capacities),
        "group_size": cfg.group_size,
        "group_chunk": cfg.group_chunk,
        "backbone_variant": cfg.backbone_variant,
        "conv1_kernel_size": cfg.conv1_kernel_size,
        "compute_dtype": cfg.backbone_compute_dtype,
        "num_keypoints": cfg.num_keypoints,
        "host_maps": cfg.host_maps,
    }
    if cfg.rot_vmap > 1:
        # omitted at the default (1) so historical manifest entries for
        # the unbatched program keep their signatures
        payload["rot_vmap"] = cfg.rot_vmap
    if extra:
        payload.update(extra)
    blob = json.dumps(payload, sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _manifest_path(cache_dir: str) -> str:
    return os.path.join(cache_dir, _MANIFEST)


def _load(cache_dir: str) -> dict:
    try:
        with open(_manifest_path(cache_dir)) as f:
            return json.load(f)
    except Exception:
        return {}


def check_describe_signature(cfg, cache_dir: str, extra: dict | None = None,
                             label: str = "describe") -> bool:
    """True when this config's describe program is known-cached.

    On a miss, prints a loud warning naming the changed contract and the
    expected cold-compile cost — the caller may still proceed (the compile
    is legal, just expensive) or abort.
    """
    sig = describe_signature(cfg, extra)
    manifest = _load(cache_dir)
    if sig in manifest:
        return True
    known = {k: v.get("label", "?") for k, v in manifest.items()}
    print(
        f"[compile-guard] {label} signature {sig} NOT in the persistent "
        f"compile-cache manifest ({_manifest_path(cache_dir)}).\n"
        f"[compile-guard] A cold block-engine compile takes ~15-25 min on "
        f"this host. Known signatures: {known or 'none'}.\n"
        f"[compile-guard] If this config change is deliberate, let the run "
        f"continue once — the signature is recorded on success.",
        file=sys.stderr, flush=True,
    )
    return False


def record_describe_signature(cfg, cache_dir: str, extra: dict | None = None,
                              label: str = "describe") -> None:
    """Record a signature after the program compiled + ran successfully."""
    sig = describe_signature(cfg, extra)
    manifest = _load(cache_dir)
    if sig in manifest:
        return
    manifest[sig] = {"label": label}
    os.makedirs(cache_dir, exist_ok=True)
    with open(_manifest_path(cache_dir), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
