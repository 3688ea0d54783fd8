#!/usr/bin/env python
"""Checkpoint-ingestion parity verifier.

Two modes:

  --synthetic (default, no files needed):
      builds deterministic torch-layout state dicts for every torch key our
      ingestion rules map (utils/parity.synthetic_sds), ingests them, and
      (a) verifies the FiLM-SIREN field output of OUR flax model on the ingested
          weights matches an independent numpy re-implementation driven directly
          by the torch sd (proves name mapping + math conventions numerically),
      (b) dumps per-module output checksums on fixed inputs.

  --ckpt <released .pt> [--full-scale]:
      ingests a real StyleSDF/E3DGE checkpoint (the surgery of reference
      utils/setup/train_setup.py:136-291) and dumps the same per-module
      checksums. Run the reference side on the same fixed inputs and diff the
      JSON — any divergent module is the ingestion bug.

Checksummed taps (reference call-stack order, SURVEY.md §3.1):
  encoder_w_offsets / encoder_wplus_offsets — E0 outputs (fpn_encoders.py:371)
  siren_raw                                 — field query (volume_renderer.py:240)
  thumb_rgb / features / depth              — volume integration (:809-913)
  gen_imgs                                  — decoder output (stylesdf_model.py:742)

Usage:
  python scripts/verify_parity.py                          # synthetic self-check
  python scripts/verify_parity.py --ckpt model.pt --out parity.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path as _P

sys.path.insert(0, str(_P(__file__).resolve().parent.parent))

from e3dge_tpu.utils.platform import apply_platform_override

apply_platform_override()  # E3DGE_PLATFORM=cpu rescues runs when the TPU relay is down

import jax
import jax.numpy as jnp
import numpy as np

# Parity requires exact-ish matmuls: on TPU the default is bf16 MXU passes, which
# turns the FiLM-SIREN comparison into O(1) noise (gamma~30 through sin). Force
# full-precision matmuls for verification (throughput paths keep the default).
jax.config.update("jax_default_matmul_precision", "highest")


def fixed_inputs(cfg, batch: int = 1, seed: int = 1234):
    """Deterministic probe inputs shared by both sides of the diff."""
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.uniform(-1, 1, (batch, 3, cfg.pifu.load_size, cfg.pifu.load_size)), jnp.float32)
    azim = jnp.asarray(rng.uniform(-0.3, 0.3, (batch,)), jnp.float32)
    elev = jnp.asarray(rng.uniform(-0.15, 0.15, (batch,)), jnp.float32)
    w = jnp.asarray(rng.randn(batch, cfg.renderer.depth + 1, cfg.renderer.style_dim) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.randn(batch, cfg.decoder.n_latent, cfg.decoder.style_dim) * 0.1, jnp.float32)
    pts = jnp.asarray(rng.uniform(-0.1, 0.1, (batch, 64, 3)), jnp.float32)
    views = jnp.asarray(rng.randn(batch, 64, 3), jnp.float32)
    views = views / jnp.linalg.norm(views, axis=-1, keepdims=True)
    return dict(images=images, azim=azim, elev=elev, w=w, wp=wp, pts=pts, views=views)


def module_checksums(model, variables, cfg, probes) -> dict:
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.render.camera import camera_params_from_angles
    from e3dge_tpu.utils.parity import checksum_report

    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    taps = {}

    # E0 encoder offsets
    enc = model.apply(variables, probes["images"], ml, method=E3DGE.image2latents)
    taps["encoder_w_offsets"] = enc["pred_latents"][0]
    taps["encoder_wplus_offsets"] = enc["pred_latents"][1]

    # raw SIREN field query at fixed points
    def siren_raw(m, pts, views, styles):
        return m.generator.renderer.query_raw(pts, views, styles)

    taps["siren_raw"] = model.apply(variables, probes["pts"], probes["views"], probes["w"], method=siren_raw)

    # volume render + decoder on a fixed camera
    cam = camera_params_from_angles(
        probes["azim"], probes["elev"], cfg.renderer.out_im_res, cfg.camera.fov_ang, cfg.camera.dist_radius
    )
    out = model.apply(
        variables, [probes["w"], probes["wp"]], cam,
        method=E3DGE.latent2image, rngs={"noise": jax.random.key(0)},
    )
    taps["thumb_rgb"] = out["gen_thumb_imgs"]
    taps["depth"] = out["depth"]
    if out.get("features") is not None:
        taps["features"] = out["features"]
    taps["gen_imgs"] = out["gen_imgs"]
    return checksum_report(taps)


def run_synthetic(args) -> int:
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.utils import config as C
    from e3dge_tpu.utils.parity import numpy_siren_forward, synthetic_sds
    from e3dge_tpu.utils.torch_ckpt import flatten_tree, ingest_variables

    cfg = C.tiny_full_config() if args.tiny else C.demo_view_synthesis_config()
    model = E3DGE(cfg)
    probes = fixed_inputs(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    print("init model (shape-only trace + fill)...", flush=True)
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, probes["images"], ml
    )

    sds, expected = synthetic_sds(variables)
    new_vars, missing = ingest_variables(variables, sds, strict=False)
    unmapped = [m for m in missing]
    if unmapped:
        print(f"FAIL: {len(unmapped)} unmapped leaves, e.g. {unmapped[:5]}")
        return 1

    # every leaf must equal its expected ingested value
    flat = flatten_tree({k: np.asarray(v) for k, v in flatten_tree(new_vars).items()})
    for path, target in expected.items():
        np.testing.assert_allclose(flat[path], target, rtol=1e-6, err_msg=path)
    print(f"ingestion roundtrip OK: {len(expected)} leaves, 0 unmapped")

    # numpy vs flax SIREN on the ingested weights
    gen_sd = sds["generator"]
    siren_sd = {k[len("renderer.network."):]: v for k, v in gen_sd.items() if k.startswith("renderer.network.")}
    warped = np.asarray(probes["pts"]) / cfg.camera.dist_radius
    ref = numpy_siren_forward(
        siren_sd, warped, np.asarray(probes["views"]), np.asarray(probes["w"]), depth=cfg.renderer.depth
    )

    def siren_raw(m, pts, views, styles):
        return m.generator.renderer.query_raw(pts, views, styles)

    ours = model.apply(new_vars, probes["pts"], probes["views"], probes["w"], method=siren_raw)
    err = np.abs(np.asarray(ours, np.float64) - ref).max()
    print(f"SIREN field: max |flax(ingested) - numpy(torch sd)| = {err:.3e}")
    # flax float32 vs float64 golden; FiLM gamma~30 through sin -> ~1e-3 noise floor
    if err > 5e-3:
        print("FAIL: SIREN parity exceeded 5e-3")
        return 1

    report = module_checksums(model, new_vars, cfg, probes)
    out_path = _P(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({"mode": "synthetic", "taps": report}, indent=2))
    print(f"parity OK; checksums -> {out_path}")
    return 0


def run_real(args) -> int:
    from e3dge_tpu.models.e3dge import E3DGE, LatentMeans
    from e3dge_tpu.utils import config as C
    from e3dge_tpu.utils.torch_ckpt import (
        E3DGE_SAVE_DICT_TOPS,
        ingest_variables,
        load_raw_ckpt,
        load_torch_file,
        normalize_g_ema_keys,
        split_e3dge_save_dict,
        split_generator_sd,
    )

    # load the (cheap) torch files FIRST — a bad path should fail before the
    # minutes-long model init on this host
    raw = load_raw_ckpt(args.ckpt)
    if isinstance(raw, dict) and any(k in raw for k in E3DGE_SAVE_DICT_TOPS):
        # full E3DGE training save_dict (base_runner.save_network layout)
        sds = split_e3dge_save_dict(raw)
        print(f"E3DGE save_dict ckpt: [{', '.join(sds)}]")
    else:
        sd = normalize_g_ema_keys(load_torch_file(args.ckpt))
        gen_sd, local_sd = split_generator_sd(sd)
        sds = {"generator": gen_sd, "local": local_sd}
    for name, path in [("encoder", args.encoder), ("grid_align", args.grid_align),
                       ("fuse_sft_block", args.fuse), ("volume_discriminator", args.volume_d)]:
        if path:
            sds[name] = normalize_g_ema_keys(load_torch_file(path))

    cfg = C.tiny_full_config() if args.tiny else C.demo_view_synthesis_config()
    model = E3DGE(cfg)
    probes = fixed_inputs(cfg)
    ml = LatentMeans(
        renderer=jnp.zeros((1, cfg.renderer.depth + 1, cfg.renderer.style_dim)),
        decoder=jnp.zeros((1, cfg.decoder.n_latent, cfg.decoder.style_dim)),
    )
    variables = jax.jit(model.init)(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, probes["images"], ml
    )
    new_vars, missing = ingest_variables(variables, sds, strict=False)
    print(f"ingested: {len(missing)} unmatched leaves")
    for m in missing[:20]:
        print("  missing:", m)

    report = module_checksums(model, new_vars, cfg, probes)
    out_path = _P(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps({"mode": "real", "ckpt": args.ckpt, "taps": report}, indent=2))
    print(f"checksums -> {out_path}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="released .pt (g_ema or full E3DGE)")
    ap.add_argument("--encoder", default=None, help="encoder sd .pt")
    ap.add_argument("--grid-align", dest="grid_align", default=None)
    ap.add_argument("--fuse", default=None)
    ap.add_argument("--volume-d", dest="volume_d", default=None)
    ap.add_argument("--out", default="runs/parity/checksums.json")
    ap.add_argument("--tiny", action="store_true", help="tiny config (fast self-check)")
    args = ap.parse_args()
    if args.ckpt:
        raise SystemExit(run_real(args))
    raise SystemExit(run_synthetic(args))


if __name__ == "__main__":
    main()
