"""Scale-level incremental SfM + distributed BA on a synthetic scene.

Builds a >=50-camera / >=5k-point scene with partial visibility,
pixel noise and outlier matches (patch2pix_tpu/sfm/synthetic.py), runs
tracks -> incremental reconstruction -> mesh-sharded distributed BA,
and reports per-stage wall time, ATE against ground truth, the
per-LM-iteration collective volume, and a COLMAP-export roundtrip —
the scale-credible stand-in for the MegaDepth-scene north star while
real data is unreachable (egress blocked).

Usage:
  python tools/sfm_scale_demo.py [--cams 50] [--pts 5000] [--mesh 8]
        [--out artifacts/sfm_scale]

Runs on a fake CPU mesh by default (the driver environment has one
physical TPU); pass --no_fake_mesh to use real devices.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=50)
    ap.add_argument("--pts", type=int, default=5000)
    ap.add_argument("--mesh", type=int, default=8)
    ap.add_argument("--noise_px", type=float, default=0.4)
    ap.add_argument("--outlier_frac", type=float, default=0.05)
    ap.add_argument("--ba_every", type=int, default=10)
    ap.add_argument(
        "--pair_gap", type=int, default=None,
        help="max ring-step separation of matched pairs; default "
        "scales with camera count to keep the ANGULAR pair-graph "
        "connectivity comparable across scene sizes (a 120-camera "
        "ring at the 50-camera default of 5 steps spans only 15 "
        "degrees — short-baseline-only connectivity no incremental "
        "SfM handles well)",
    )
    ap.add_argument("--out", default="artifacts/sfm_scale")
    ap.add_argument("--no_fake_mesh", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--cell", type=float, default=4.0)
    ap.add_argument("--min_track_len", type=int, default=2)
    args = ap.parse_args()

    if not args.no_fake_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    from jax.sharding import Mesh

    from patch2pix_tpu.sfm.dist_ba import run_dist_ba, shard_problem
    from patch2pix_tpu.sfm.incremental import IncrementalSfM, export_colmap
    from patch2pix_tpu.sfm.metrics import ate_rmse
    from patch2pix_tpu.sfm.synthetic import make_scale_scene

    pair_gap = args.pair_gap
    if pair_gap is None:
        pair_gap = max(5, round(args.cams / 10))
    t0 = time.time()
    Rs_gt, ts_gt, X_gt, K, pair_matches = make_scale_scene(
        n_cams=args.cams, n_pts=args.pts, noise_px=args.noise_px,
        outlier_frac=args.outlier_frac, max_pair_gap=pair_gap,
    )
    n_match = sum(len(m) for m in pair_matches.values())
    t_scene = time.time() - t0
    print(f"scene: {args.cams} cams, {args.pts} pts, "
          f"{len(pair_matches)} pairs, {n_match} matches "
          f"({100 * args.outlier_frac:.0f}% outliers) [{t_scene:.1f}s]")

    t0 = time.time()
    sfm = IncrementalSfM(
        pair_matches, {i: K for i in range(args.cams)}, px_thres=2.0,
        cell=args.cell, min_track_len=args.min_track_len,
        log=print if args.verbose else lambda *_: None,
    )
    t_tracks = time.time() - t0
    print(f"tracks: {len(sfm.tracks)} [{t_tracks:.1f}s]")

    t0 = time.time()
    rec = sfm.run(ba_every=args.ba_every)
    t_inc = time.time() - t0
    gt_centers = np.stack([-R.T @ t for R, t in zip(Rs_gt, ts_gt)])
    if len(rec.registered) != args.cams:
        print("registration shortfall diagnostics:",
              sfm.registration_report())
    assert len(rec.registered) == args.cams, (
        f"only {len(rec.registered)}/{args.cams} registered"
    )
    ate_inc = ate_rmse(rec.centers(), gt_centers)
    print(f"incremental: {len(rec.registered)} cams, "
          f"{len(rec.points)} points, ATE {ate_inc:.4f} "
          f"[{t_inc:.1f}s = {t_inc / args.cams:.2f} s/image]")
    stage_stats = {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in sorted(sfm.stats.items())}
    accounted = sum(v for k, v in sfm.stats.items() if k.endswith("_s"))
    stage_stats["host_bookkeeping_s"] = round(t_inc - accounted, 2)
    print(f"stage attribution: {stage_stats}")

    # mesh-sharded distributed BA refinement
    Rs, ts, X, cam_idx, pt_idx, uv, f_mean, reg, tids = sfm.assemble_ba()
    mesh = Mesh(np.asarray(jax.devices()[: args.mesh]), ("ba",))
    sp = shard_problem(Rs, ts, X, cam_idx, pt_idx, uv, n_shards=args.mesh)
    t0 = time.time()
    Rs2, ts2, X2, cost = run_dist_ba(
        sp, mesh, max_iters=20, huber_delta=3.0 / f_mean,
    )
    t_dba = time.time() - t0
    for c, im in enumerate(reg):
        rec.Rs[im] = np.asarray(Rs2[c], np.float64)
        rec.ts[im] = np.asarray(ts2[c], np.float64)
    ate_dba = ate_rmse(rec.centers(), gt_centers)
    C = len(reg)
    psum_mb = (6 * C) ** 2 * 4 / 1e6
    print(f"dist BA ({args.mesh}-way point-sharded, {len(cam_idx)} obs): "
          f"cost {cost:.3e}, ATE {ate_dba:.4f} [{t_dba:.1f}s]; "
          f"per-iteration psum {psum_mb:.2f} MB (reduced {6 * C}^2 system)")

    # COLMAP export roundtrip at scale
    os.makedirs(args.out, exist_ok=True)
    export_dir = os.path.join(args.out, "colmap")
    os.makedirs(export_dir, exist_ok=True)
    export_colmap(rec, export_dir, ext=".bin")
    from patch2pix_tpu.data.colmap_model import read_model

    cams_r, ims_r, pts_r = read_model(export_dir, ext=".bin")
    assert len(ims_r) == args.cams and len(pts_r) == len(rec.points)
    print(f"colmap export roundtrip: {len(ims_r)} images, "
          f"{len(pts_r)} points OK")

    radius = float(np.linalg.norm(gt_centers, axis=1).mean())
    summary = {
        "cams": args.cams, "pts": args.pts,
        "pairs": len(pair_matches), "matches": n_match,
        "outlier_frac": args.outlier_frac, "noise_px": args.noise_px,
        "tracks": len(sfm.tracks), "points": len(rec.points),
        "obs": int(len(cam_idx)),
        "t_tracks_s": round(t_tracks, 1),
        "t_incremental_s": round(t_inc, 1),
        "s_per_image": round(t_inc / args.cams, 2),
        "t_dist_ba_s": round(t_dba, 1),
        "ate_incremental": float(ate_inc),
        "ate_after_dist_ba": float(ate_dba),
        "ate_pct_of_radius": round(100 * float(ate_dba) / radius, 3),
        "dist_ba_psum_mb_per_iter": round(psum_mb, 2),
        "mesh": args.mesh,
        "stage_attribution": stage_stats,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
