"""hdrvae command-line interface.

Subcommands:
  decode   latent (.npy/.safetensors) -> HDR decode -> EXR/HDR file
  upscale  EXR/HDR image -> ESRGAN HDR upscale -> EXR/HDR file
  export   re-export a numpy/EXR image through the export pipeline
  convert  torch VAE/upscaler checkpoint -> framework safetensors
  inspect  print a checkpoint/model structure summary
  bench    run the benchmark harness

The reference has no CLI (SURVEY.md section 0: everything rides ComfyUI);
this is the framework's standalone entry point.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

import numpy as np

logger = logging.getLogger("hdrvae.cli")


def _load_latent(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".safetensors"):
        from hdrvae.models.params import load_safetensors
        sd = load_safetensors(path)
        if len(sd) != 1:
            raise ValueError(
                f"latent safetensors must hold one tensor, found "
                f"{sorted(sd)}")
        return next(iter(sd.values()))
    raise ValueError(f"unsupported latent format: {path}")


def _load_image(path: str) -> np.ndarray:
    if path.endswith(".exr"):
        from hdrvae.io import exr
        return exr.read_exr(path)
    if path.endswith(".hdr"):
        from hdrvae.io import hdr
        return hdr.read_hdr(path)
    if path.endswith(".npy"):
        return np.load(path)
    raise ValueError(f"unsupported image format: {path}")


def _add_export_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--prefix", default="hdrvae")
    p.add_argument("--output-path", default="")
    p.add_argument("--format", choices=("exr", "hdr"), default="exr")
    p.add_argument("--bit-depth", choices=("16bit", "32bit"),
                   default="32bit")
    p.add_argument("--compression",
                   choices=("none", "rle", "zip", "piz", "pxr24"),
                   default="zip")
    p.add_argument("--versioning", action="store_true")


def _parse_precision(args):
    """--precision tier + the legacy --parity override (one definition;
    cmd_decode and cmd_serve share it).  --parity combined with an
    explicit non-parity --precision is a contradiction and errors out
    instead of silently running parity (ADVICE round-4)."""
    from hdrvae.core.config import Precision
    if getattr(args, "parity", False):
        if args.precision not in ("fast", "parity"):
            # "fast" is the argparse default, so a bare --parity still
            # works; anything else was explicitly requested and clashes.
            raise SystemExit(
                f"--parity contradicts --precision {args.precision}; "
                "pass only one (--parity is the legacy spelling of "
                "--precision parity)")
        return Precision.parity()
    return {"fast": Precision.fast, "mixed": Precision.mixed,
            "parity": Precision.parity}[args.precision]()


def _export_cfg(args):
    from hdrvae.core.config import ExportConfig
    return ExportConfig(filename_prefix=args.prefix,
                        output_path=args.output_path,
                        format=args.format, bit_depth=args.bit_depth,
                        compression=args.compression,
                        versioning=args.versioning)


def _export(image: np.ndarray, args) -> str:
    from hdrvae.io.export import export_linear
    cfg = _export_cfg(args)
    from hdrvae.api import folders
    res = export_linear(image, cfg,
                        default_output_dir=folders.get_output_directory())
    if res.error:
        raise SystemExit(res.error)
    print(json.dumps({"filepath": res.last, **res.verify_stats}))
    return res.last


def cmd_decode(args) -> int:
    import jax.numpy as jnp
    from hdrvae.api.vae import VAE
    from hdrvae.core.config import (DecoderConfig, HDRDecodeConfig,
                                    Precision)
    from hdrvae.decode.pipeline import decode_summary, hdr_decode

    if args.vae:
        # topology inferred from the checkpoint shapes (Flux z=16,
        # SD1.5/SDXL z=4 — VAE.load's config=None path); forcing the
        # Flux DecoderConfig here would reject every non-Flux VAE
        vae = VAE.load(args.vae)
        cfg = vae.config
    else:
        logger.warning("no --vae checkpoint given; using random weights")
        cfg = DecoderConfig()
        vae = VAE.random_init(seed=0, config=cfg)

    if args.latent:
        latent = _load_latent(args.latent)
    else:
        rng = np.random.default_rng(args.seed)
        edge = args.size // cfg.spatial_scale
        latent = rng.standard_normal(
            (args.batch, edge, edge, cfg.z_channels)).astype(np.float32)
    if latent.ndim == 3:
        latent = latent[None]

    precision = _parse_precision(args)
    hdr_cfg = HDRDecodeConfig(
        hdr_mode=args.mode,
        conservative_ev_multiplier=args.ev_multiplier)
    if args.pipelined:
        # frame-sequence config 5: decode frame N+1 on device while frame
        # N is fetched and frame N-1 encodes/writes (io.pipeline); each
        # frame optionally decodes via the sharded slab path.
        from hdrvae.api import folders
        from hdrvae.core.config import ExportConfig
        from hdrvae.io.pipeline import export_stream

        if args.tiled:
            from hdrvae.sharding.mesh import make_mesh, sharded_slab_decode
            mesh = make_mesh(num_devices=args.mesh)

        def make_frame(i):
            def f():
                one = jnp.asarray(latent[i:i + 1])
                if args.tiled:
                    r = sharded_slab_decode(vae.params, one, cfg, hdr_cfg,
                                            mesh=mesh, precision=precision)
                else:
                    r = hdr_decode(vae.params, one, cfg, hdr_cfg,
                                   precision)
                return r.image[0]
            return f

        exp_cfg = ExportConfig(filename_prefix=args.prefix,
                               output_path=args.output_path,
                               format=args.format,
                               bit_depth=args.bit_depth,
                               compression=args.compression,
                               versioning=args.versioning,
                               frame_sequence=latent.shape[0] > 1)
        res = export_stream(
            [make_frame(i) for i in range(latent.shape[0])], exp_cfg,
            default_output_dir=folders.get_output_directory())
        if res.error:
            raise SystemExit(res.error)
        print(json.dumps({"frames": len(res.filepaths),
                          "last": res.last, **res.verify_stats}))
        return 0
    if args.tiled:
        # BASELINE.json config 5 from one command: sharded decode over the
        # device mesh (exact slab path: whole-image mid attention + GN
        # stats psum-reduced across slabs) -> linear EXR.
        from hdrvae.sharding.mesh import make_mesh, sharded_slab_decode
        mesh = make_mesh(num_devices=args.mesh)
        result = sharded_slab_decode(vae.params, jnp.asarray(latent), cfg,
                                     hdr_cfg, mesh=mesh,
                                     precision=precision)
    else:
        result = hdr_decode(vae.params, jnp.asarray(latent), cfg, hdr_cfg,
                            precision)
    print(json.dumps(decode_summary(result)))
    if result.image.shape[0] == 1 and args.format == "exr":
        # single-frame EXR: stream scanline bands off the device while
        # earlier bands compress/write (io.pipeline.export_frame_streamed
        # — byte-identical file, ~max(fetch, encode) wall time)
        from hdrvae.api import folders
        from hdrvae.io.pipeline import export_frame_streamed
        res = export_frame_streamed(result.image[0], _export_cfg(args),
                                    default_output_dir=
                                    folders.get_output_directory())
        if res.error:
            raise SystemExit(res.error)
        # same stdout contract as the serial export path (_export)
        print(json.dumps({"filepath": res.last, **res.verify_stats}))
    else:
        _export(np.asarray(result.image), args)
    return 0


def cmd_upscale(args) -> int:
    import jax.numpy as jnp
    from hdrvae.core.config import TilingConfig, UpscaleConfig
    from hdrvae.models.rrdbnet import load_upscale_model
    from hdrvae.upscale.pipeline import hdr_upscale

    params, model_cfg, arch = load_upscale_model(args.model)
    image = _load_image(args.image)
    if image.ndim == 3:
        image = image[None]
    cfg = UpscaleConfig(small_blur=args.small_blur,
                        local_fix=args.local_fix,
                        upscale_method=args.upscale_method,
                        tiling=TilingConfig(tile=args.tile,
                                            overlap=args.overlap))
    precision = _parse_precision(args)
    if args.sharded:
        # tile-grid data parallelism over the device mesh (the upscaler
        # analog of `decode --sharded`)
        from hdrvae.sharding.mesh import make_mesh, sharded_hdr_upscale
        result = sharded_hdr_upscale(params,
                                     jnp.asarray(image, jnp.float32),
                                     model_cfg, cfg, architecture=arch,
                                     mesh=make_mesh(),
                                     precision=precision)
    else:
        result = hdr_upscale(params, jnp.asarray(image, jnp.float32),
                             model_cfg, cfg, architecture=arch,
                             precision=precision)
    print(json.dumps({"architecture": arch, "scale": model_cfg.scale,
                      "sharded": bool(args.sharded),
                      "out_shape": list(result.image.shape)}))
    _export(np.asarray(result.image), args)
    return 0


def cmd_export(args) -> int:
    image = _load_image(args.image)
    _export(image, args)
    return 0


def cmd_convert(args) -> int:
    """torch checkpoint -> framework safetensors (weights converted once;
    SURVEY.md section 5 checkpoint row)."""
    from safetensors.numpy import save_file

    if args.kind == "vae":
        import torch
        from hdrvae.models.params import (decoder_params_from_state_dict,
                                          decoder_params_to_state_dict,
                                          infer_decoder_config)
        if args.input.endswith(".safetensors"):
            from hdrvae.models.params import load_safetensors
            sd = load_safetensors(args.input)
        else:
            sd = torch.load(args.input, map_location="cpu",
                            weights_only=True)
        # unwrap nested containers (ldm .ckpt stores weights under
        # 'state_dict') — the same loop utils.introspect uses, so
        # `convert` accepts every checkpoint `inspect` does
        for container in ("params_ema", "params", "state_dict"):
            if isinstance(sd.get(container), dict):
                sd = sd[container]
                break
        cfg = infer_decoder_config(sd)
        print(json.dumps({"inferred_config": {
            "z_channels": cfg.z_channels, "ch": cfg.ch,
            "ch_mult": list(cfg.ch_mult),
            "num_res_blocks": cfg.num_res_blocks,
            "attn_mid": cfg.attn_mid,
            "scale_factor": cfg.scale_factor,
            "shift_factor": cfg.shift_factor}}))
        params = decoder_params_from_state_dict(sd, cfg)
        out_sd = decoder_params_to_state_dict(params, cfg)
        save_file({f"decoder.{k}": v for k, v in out_sd.items()},
                  args.output)
    else:  # upscaler — ANY zoo architecture, not just RRDBNet
        import dataclasses
        from hdrvae.models.zoo import load_upscale_model
        from hdrvae.utils.introspect import flatten_params
        params, cfg, arch = load_upscale_model(args.input)
        # ascontiguousarray: safetensors save_file silently writes the raw
        # buffer of strided views (see models/params.py put_conv)
        flat = {path: np.ascontiguousarray(np.asarray(leaf))
                for path, leaf in flatten_params(params)}
        save_file(flat, args.output)
        print(json.dumps({"architecture": arch, "scale": cfg.scale,
                          "config": {k: v for k, v in
                                     dataclasses.asdict(cfg).items()
                                     if isinstance(v, (int, float, str,
                                                       bool))}}))
    print(json.dumps({"output": args.output}))
    return 0


def cmd_inspect(args) -> int:
    from hdrvae.utils.introspect import describe_params, describe_state_dict
    if args.path:
        print(describe_state_dict(args.path))
    else:
        import jax
        from hdrvae.core.config import DecoderConfig
        from hdrvae.models.decoder import init_decoder
        params = init_decoder(jax.random.PRNGKey(0), DecoderConfig())
        print(describe_params(params, name="flux1-vae-decoder"))
    return 0


def cmd_run(args) -> int:
    """Execute a workflow JSON graph (the framework-owned replacement for
    the host graph executor the reference relies on)."""
    from hdrvae.api.graph import GraphExecutor
    from hdrvae.api.vae import VAE
    from hdrvae.core.config import DecoderConfig

    # Parse/validate the graph BEFORE any (slow) model construction so bad
    # files fail fast.
    with open(args.workflow) as f:
        workflow = json.load(f)
    if "nodes" not in workflow:
        raise SystemExit(f"{args.workflow}: no 'nodes' list in workflow")

    if args.vae:
        vae = VAE.load(args.vae)   # config inferred from the checkpoint
        cfg = vae.config
    else:
        cfg = DecoderConfig()
        vae = VAE.random_init(seed=0, config=cfg)
    if args.latent:
        latent = _load_latent(args.latent)
    else:
        rng = np.random.default_rng(args.seed)
        edge = args.size // cfg.spatial_scale
        latent = rng.standard_normal(
            (1, edge, edge, cfg.z_channels)).astype(np.float32)
    if latent.ndim == 3:
        latent = latent[None]

    # External inputs: internal-format graphs reference the fixed names
    # latent_source / vae_loader; ComfyUI-export graphs are converted
    # with externals keyed by the dropped source node's TYPE (e.g.
    # KSampler, VAELoader) — map each key by what it plausibly feeds.
    externals = {"latent_source": ({"samples": latent},),
                 "vae_loader": (vae,)}
    from hdrvae.api.graph import convert_comfyui_workflow, is_comfyui_format
    if is_comfyui_format(workflow):
        import hdrvae
        converted = convert_comfyui_workflow(
            workflow, {**hdrvae.NODE_CLASS_MAPPINGS})
        for key in converted.get("external_keys", []):
            low = key.lower()
            if "vae" in low:
                externals[key] = (vae,)
            elif "sampler" in low or "latent" in low:
                externals[key] = ({"samples": latent},)
            else:
                raise SystemExit(
                    f"workflow needs external input {key!r}; only VAE "
                    "and latent/sampler sources can be auto-supplied")

    results = GraphExecutor(external_inputs=externals).run(workflow)
    for node_id, outputs in results.items():
        desc = [getattr(o, "shape", o) for o in outputs]
        print(json.dumps({"node": node_id,
                          "outputs": [str(d) for d in desc]}))
    return 0


def cmd_serve(args) -> int:
    from hdrvae.api.vae import VAE
    from hdrvae.core.config import (DecoderConfig, HDRDecodeConfig,
                                    Precision)
    from hdrvae.serve.engine import ServeEngine
    from hdrvae.serve.http import serve_forever

    if args.vae:
        vae = VAE.load(args.vae)
    else:
        logger.warning("no --vae checkpoint given; using random weights")
        vae = VAE.random_init(seed=0, config=DecoderConfig())
    precision = _parse_precision(args)
    mesh = None
    if args.sharded:
        from hdrvae.sharding.mesh import make_mesh
        mesh = make_mesh()
        logger.info("serving through the exact sharded slab path on a "
                    "%d-device mesh", mesh.devices.size)
    # --bucket composes with --sharded since round 5 (PadMask threads
    # through the slab tail; SlabPadGNReducer) — one compiled slab
    # program per bucket shape on the mesh too.
    engine = ServeEngine(
        vae, hdr_cfg=HDRDecodeConfig(hdr_mode=args.mode),
        precision=precision,
        bucket=args.bucket if args.bucket > 0 else None,
        max_pending=args.max_pending, mesh=mesh,
        deadline_s=args.deadline if args.deadline > 0 else None)
    if args.warmup:
        scale = vae.config.spatial_scale
        sizes = [int(s) // scale for s in args.warmup.split(",") if s]
        logger.info("warming up latent sizes %s ...", sizes)
        engine.warmup([(s, s) for s in sizes])
    serve_forever(engine, args.host, args.port)
    return 0


def cmd_bench(args) -> int:
    import subprocess
    import os
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.dirname(
               os.path.dirname(os.path.abspath(__file__)))), "bench.py")]
    if args.size:
        cmd += ["--size", str(args.size)]
    return subprocess.call(cmd)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="hdrvae",
        description="TPU-native HDR VAE decode framework")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("decode", help="HDR-decode a latent to EXR/HDR")
    p.add_argument("--latent", help=".npy or single-tensor .safetensors")
    p.add_argument("--vae", help="Flux.1 ae.safetensors checkpoint")
    p.add_argument("--mode", default="mathematical_recovery",
                   choices=("conservative", "exposure", "adaptive_recovery",
                            "mathematical_recovery"))
    p.add_argument("--ev-multiplier", type=float, default=1.0)
    p.add_argument("--size", type=int, default=1024,
                   help="output edge when generating a random latent")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--parity", action="store_true",
                   help="full float32 numerics (alias for "
                        "--precision parity)")
    p.add_argument("--precision", default="fast",
                   choices=("fast", "mixed", "parity"),
                   help="numerics tier: fast (bf16 throughput), mixed "
                        "(f32 + 3-pass dots, meets the <=1e-3 "
                        "contract), parity (exact f32)")
    p.add_argument("--batch", type=int, default=1,
                   help="frames when generating a random latent")
    p.add_argument("--tiled", action="store_true",
                   help="sharded slab decode over the device mesh "
                        "(BASELINE.json config 5)")
    p.add_argument("--mesh", type=int, default=None,
                   help="device count for --tiled (default: all)")
    p.add_argument("--pipelined", action="store_true",
                   help="overlap decode, device->host fetch, and EXR "
                        "write across the frame sequence (composes "
                        "with --tiled)")
    _add_export_args(p)
    p.set_defaults(func=cmd_decode)

    p = sub.add_parser("upscale", help="HDR-upscale an EXR/HDR image")
    p.add_argument("--image", required=True)
    p.add_argument("--model", required=True,
                   help="ESRGAN-family checkpoint path")
    p.add_argument("--small-blur", action="store_true")
    p.add_argument("--local-fix", action="store_true")
    p.add_argument("--upscale-method", default="bislerp",
                   choices=("nearest-exact", "bilinear", "area", "bicubic",
                            "bislerp"))
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--sharded", action="store_true",
                   help="shard the tile grid over the device mesh")
    p.add_argument("--precision", default="parity",
                   choices=("fast", "mixed", "parity"),
                   help="numerics tier (default parity — the reference "
                        "float32 contract; fast is the measured 1.7-1.9x "
                        "bf16 tile-pass tier)")
    _add_export_args(p)
    p.set_defaults(func=cmd_upscale)

    p = sub.add_parser("export", help="re-export an image file")
    p.add_argument("--image", required=True)
    _add_export_args(p)
    p.set_defaults(func=cmd_export)

    p = sub.add_parser("convert",
                       help="torch checkpoint -> framework safetensors")
    p.add_argument("kind", choices=("vae", "upscaler"))
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(func=cmd_convert)

    p = sub.add_parser("inspect", help="describe a model/checkpoint")
    p.add_argument("--path", help="checkpoint to describe (default: "
                                  "built-in Flux.1 decoder topology)")
    p.set_defaults(func=cmd_inspect)

    p = sub.add_parser("bench", help="run the benchmark harness")
    p.add_argument("--size", type=int)
    p.set_defaults(func=cmd_bench)

    p = sub.add_parser("serve", help="HTTP decode service (POST .npy "
                                     "latents to /v1/decode, get EXR/HDR)")
    p.add_argument("--vae", help="Flux.1 ae.safetensors checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8475)
    p.add_argument("--mode", default="mathematical_recovery",
                   choices=("conservative", "exposure", "adaptive_recovery",
                            "mathematical_recovery"))
    p.add_argument("--parity", action="store_true",
                   help="full float32 numerics (alias for "
                        "--precision parity)")
    p.add_argument("--precision", default="fast",
                   choices=("fast", "mixed", "parity"),
                   help="numerics tier: fast (bf16), mixed (f32 "
                        "activations + 3-pass MXU dots, meets the "
                        "<=1e-3 contract), parity (exact f32)")
    p.add_argument("--bucket", type=int, default=64,
                   help="latent shape-bucket multiple (0 = compile per "
                        "exact shape)")
    p.add_argument("--max-pending", type=int, default=32,
                   help="request-queue bound (503 beyond it)")
    p.add_argument("--sharded", action="store_true",
                   help="route decodes through the exact sharded slab "
                        "path over the full device mesh (disables "
                        "bucketing; pre-compile shapes with --warmup)")
    p.add_argument("--deadline", type=float, default=0.0,
                   help="per-request queue deadline in seconds (0 = "
                        "none); expired-in-queue requests fail fast "
                        "with 504")
    p.add_argument("--warmup", default="",
                   help="comma-separated output edges to pre-compile, "
                        "e.g. 1024,2048")
    p.set_defaults(func=cmd_serve)

    p = sub.add_parser("run", help="execute a workflow JSON graph")
    p.add_argument("workflow")
    p.add_argument("--latent", help="latent fed as external input "
                                    "'latent_source'")
    p.add_argument("--vae", help="VAE checkpoint fed as 'vae_loader'")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=512)
    p.set_defaults(func=cmd_run)
    return parser


def main(argv=None) -> int:
    # parse BEFORE runtime setup: --help and usage errors must not pay
    # the multi-second jax import or touch the cache directory
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    from hdrvae.core.runtime import setup
    setup()  # persistent compilation cache
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
