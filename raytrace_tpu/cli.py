"""`raytrace-tpu` console entry point: render a pbrt-v2 scene file → PNG.

The reference's end-user surface is `pbrt scene.pbrt` with the cuda renderer
plugged in (/root/reference/README:12); this is the equivalent:

    raytrace-tpu scene.pbrt -o out.png --photon-paths 65536 --passes 4

The renderer is chosen by the scene's Renderer statement ("simple" → direct
lighting only, anything else → photon mapping, mirroring
cudarender.cpp:126-134), overridable with --renderer.
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="raytrace-tpu", description=__doc__)
    ap.add_argument("scene", help="pbrt-v2 scene file")
    ap.add_argument("-o", "--out", default="/tmp/render.png")
    ap.add_argument("--renderer", choices=("auto", "simple", "photon"),
                    default="auto")
    ap.add_argument("--photon-paths", type=int, default=1 << 16)
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--spp", type=int, default=0, help="override sampler spp")
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--footprint-radius-scale", type=float, default=0.0,
                    help="SPPM footprint-seeded initial radii (0 = off)")
    ap.add_argument("--checkpoint", default=None,
                    help="progressive checkpoint path (resume if it exists)")
    ap.add_argument("--pfm", default=None, help="also write raw PFM here")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax

    if args.cpu:
        import os

        # cross-machine CPU AOT cache entries can segfault on load
        # (tests/conftest.py) — skip the persistent cache on CPU
        os.environ.setdefault("RAYTRACE_TPU_NO_COMPILE_CACHE", "1")
        jax.config.update("jax_platforms", "cpu")

    from raytrace_tpu.core.config import RenderConfig
    from raytrace_tpu.renderers.photon import (
        render_photon,
        render_photon_progressive,
    )
    from raytrace_tpu.renderers.simple import render_simple
    from raytrace_tpu.scene.pbrt import load_pbrt
    from raytrace_tpu.utils import image as img_io
    from raytrace_tpu.utils import metrics

    t0 = time.perf_counter()
    parsed = load_pbrt(args.scene)
    print(f"parsed {args.scene}: {parsed.width}x{parsed.height} "
          f"renderer={parsed.renderer} ({time.perf_counter()-t0:.1f}s)")

    config = RenderConfig(
        width=parsed.width, height=parsed.height,
        spp=args.spp or parsed.spp, scene_epsilon=1e-3,
        photon_paths=args.photon_paths, photon_passes=args.passes,
        seed=args.seed,
        footprint_radius_scale=args.footprint_radius_scale,
        pixel_filter=parsed.pixel_filter,
    )
    key = jax.random.PRNGKey(args.seed)
    which = args.renderer
    if which == "auto":
        which = "simple" if parsed.renderer == "simple" else "photon"

    with metrics.Throughput() as t:
        if which == "simple":
            img = render_simple(parsed.scene, parsed.camera, config, key)
        elif args.checkpoint or args.passes > 1:
            img, _ = render_photon_progressive(
                parsed.scene, parsed.camera, config, key,
                checkpoint_path=args.checkpoint, verbose=True)
        else:
            img = render_photon(parsed.scene, parsed.camera, config, key)
        img.block_until_ready()
    rays = config.n_pixel_samples
    print(f"rendered in {t.seconds:.2f}s  ({t.rate(rays)/1e6:.3f} Mrays/s, "
          f"{t.rate(config.photon_paths * config.photon_passes)/1e6:.3f} "
          f"Mphotons/s)")

    # dispatch by extension: .exr = linear float (the reference's film
    # output format, photonmappingrenderer.cpp:283), .pfm = linear float,
    # anything else = gamma-mapped PNG
    out = str(args.out)
    if out.endswith(".exr"):
        img_io.write_exr(out, np.asarray(img))
    elif out.endswith(".pfm"):
        img_io.write_pfm(out, np.asarray(img))
    else:
        img_io.write_png(out, img)
    print(f"wrote {out}")
    if args.pfm:
        img_io.write_pfm(args.pfm, img)
        print(f"wrote {args.pfm}")


if __name__ == "__main__":
    main()
