#!/usr/bin/env python
"""Trace a target on the TPU with jax.profiler and summarize device op
time by kind from the xplane proto (the tensorboard_plugin_profile
converter is version-broken in this image; tensorflow.tsl xplane_pb2
parses the raw file fine -- NOTES_ROUND3).

Usage: python tools/xprof_summary.py --what morphfc_fused|morphfc_slow|traj|model
Prints a sorted table of op-name buckets and total device time.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def summarize_xplane(logdir, topk=25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    per_op = defaultdict(float)
    per_kind = defaultdict(float)
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name or "Step" in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                per_op[name] += dur
                kind = re.split(r"[.\d]", name, 1)[0]
                per_kind[kind] += dur
    return per_op, per_kind, total


def sync_ops_with_scope(logdir):
    """Per-op sync-timeline accounting with HLO metadata.

    Returns (spans, total_ms) where spans is a list of dicts
    {dur, name, scope, category} for every SYNC event on the XLA Ops
    line (async -start/-done DMA spans excluded, same rule as
    gap_analysis), aggregated by op instance name.  ``scope`` is the
    op's source scope (the jax name-stack recorded in op_name metadata),
    which is what lets the ``--mode bins`` report bin fusions by model
    component instead of by opaque fusion ids.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    agg = {}
    total = 0.0
    for plane in xs.planes:
        if "TPU" not in plane.name or "Step" in plane.name:
            continue
        ev_names = plane.event_metadata
        stat_names = plane.stat_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                md = ev_names[ev.metadata_id]
                name = md.name
                base = name.split(" ", 1)[0]
                if base.endswith("-start") or base.endswith("-done"):
                    continue
                dur = ev.duration_ps / 1e9  # ms
                total += dur
                if name in agg:
                    agg[name]["dur"] += dur
                    agg[name]["count"] += 1
                    continue
                def stat_val(st):
                    if st.str_value:
                        return st.str_value
                    if st.bytes_value:
                        return st.bytes_value.decode("utf-8", "replace")
                    if st.ref_value:  # interned string
                        return stat_names[st.ref_value].name
                    for f in ("int64_value", "uint64_value",
                              "double_value"):
                        v = getattr(st, f, 0)
                        if v:
                            return str(v)
                    return ""

                stats = {}
                for st in list(ev.stats) + list(md.stats):
                    stats[stat_names[st.metadata_id].name] = stat_val(st)
                agg[name] = {
                    "dur": dur, "count": 1, "name": name,
                    "stats": stats,
                }
    return list(agg.values()), total


def dump_scope_stats(logdir, topk=40, min_ms=0.0):
    """Print every sync op >= min_ms with its full metadata stats (used
    once to discover which stat keys carry the jax scope, then by --mode
    bins for the itemization)."""
    spans, total = sync_ops_with_scope(logdir)
    spans.sort(key=lambda d: -d["dur"])
    print(f"sync total {total:.2f} ms over {len(spans)} distinct ops")
    for d in spans[:topk]:
        if d["dur"] < min_ms:
            break
        print(f"\n{d['dur']:8.3f} ms x{d['count']:<4d} {d['name']}")
        for k, v in d["stats"].items():
            if v:
                print(f"        {k}: {str(v)[:160]}")


# (pool, regex over the first repo line of the op's source_stack) --
# first match wins.  Built from the round-5 scopes dump of the serving
# trace (every sync leaf >= 2 ms lands in a named pool, VERDICT r4 #1).
POOL_PATTERNS = [
    ("trajectory in-scan resblock convs", r"trajectory\.py:(7[0-9]|8[0-9]|9[0-9])"),
    ("trajectory scan (other)", r"trajectory\.py|axes_scan"),
    ("LTAM kernel", r"ltam_attention"),
    ("FFN kernels", r"group_conv\.py"),
    ("MorphFC fused kernels", r"morphfc_fused"),
    ("RCAB c-branch convs", r"blocks\.py:(5[0-9][0-9])"),
    ("stage-1..5 XLA axis branches", r"blocks\.py:(6[0-9][0-9]|8[0-9][0-9])"),
    ("TAB norms/gates/misc", r"blocks\.py|norms\.py"),
    ("flow warps (gathers)", r"ops/warp\.py"),
    ("SPyNet convs", r"spynet\.py"),
    ("recon head", r"pixel_shuffle\.py|vmg\.py:4[23][0-9]"),
    ("U-Net resample/skips/proj/misc", r"vmg\.py|resize\.py"),
]

# umbrella / async categories excluded from the leaf sync accounting:
# copy-start spans are ASYNC copies overlapping compute, 'while' events
# span their whole loop (their inner ops are listed separately)
NON_LEAF_CATEGORIES = {"copy-start", "copy-done", "async-start",
                       "async-done", "while", "conditional", "call"}


def print_bins(logdir, topk=30):
    """Pool itemization over the SYNC LEAF timeline: bin every leaf op
    by its first repo source line, print the pool table (sums to ~wall),
    each pool's largest members, and the async-copy totals separately."""
    import re as _re
    spans, _ = sync_ops_with_scope(logdir)

    def srckey(d):
        st = (d["stats"].get("source_stack", "")
              or d["stats"].get("source", ""))
        for ln in st.split("\n"):
            if "vmg_tpu" in ln:
                return ln.strip().split("/vmg_tpu/")[-1]
        first = st.split("\n")[0].strip()
        return first.split("site-packages/")[-1] if first else "?"

    leaf, asyncs, whiles = [], [], []
    for d in spans:
        cat = d["stats"].get("hlo_category", "?")
        (asyncs if cat in ("copy-start", "async-start") else
         whiles if cat == "while" else
         leaf if cat not in NON_LEAF_CATEGORIES else []).append(d)
        d["scope"] = srckey(d)

    pools = defaultdict(list)
    for d in leaf:
        for pool, pat in POOL_PATTERNS:
            if _re.search(pat, d["scope"]):
                pools[pool].append(d)
                break
        else:
            pools["UNBINNED"].append(d)
    total = sum(x["dur"] for x in leaf)
    print(f"sync LEAF total {total:.2f} ms "
          f"(async copy spans {sum(x['dur'] for x in asyncs):.0f} ms "
          f"overlap it; 'while' umbrellas {sum(x['dur'] for x in whiles):.0f} ms"
          f" contain the in-scan leaves); pool table:")
    rows = sorted(pools.items(), key=lambda kv: -sum(x["dur"]
                                                     for x in kv[1]))
    for pool, ds in rows:
        t = sum(x["dur"] for x in ds)
        print(f"  {t:8.2f} ms {100 * t / total:5.1f}%  {pool} "
              f"({sum(x['count'] for x in ds)} events)")
    for pool, ds in rows:
        ds.sort(key=lambda d: -d["dur"])
        print(f"\n-- {pool}: top members --")
        for d in ds[:topk if pool == 'UNBINNED' else 6]:
            print(f"  {d['dur']:8.3f} ms x{d['count']:<4d} "
                  f"{d['name'].split(' ')[0][:36]:36s} {d['scope'][:70]}")


def gap_analysis(logdir, topk=12):
    """Timeline view of the synchronous op stream.

    ``-start``/``-done`` events are spans of ASYNC DMA that overlap
    compute (their durations sum to several times wall -- see
    NOTES_ROUND4), so the op-kind table over-counts them.  This merges
    the [offset, offset+dur) intervals of the SYNC events on the XLA Ops
    line instead: ``busy`` is real serialized device time, and the
    largest holes between consecutive sync ops are genuine stalls
    (usually waits on weight/activation DMA), printed with the ops on
    either side.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    path = max(files, key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    spans = []  # (start_ms, end_ms, name)
    for plane in xs.planes:
        if "TPU" not in plane.name or "Step" in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            if "XLA Ops" not in line.name and "XLA Op" != line.name:
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                base = name.split(" ", 1)[0]
                if base.endswith("-start") or base.endswith("-done"):
                    continue
                s = ev.offset_ps / 1e9
                spans.append((s, s + ev.duration_ps / 1e9, name))
    if not spans:
        raise RuntimeError("no sync events on the XLA Ops line")
    spans.sort()
    wall = spans[-1][1] - spans[0][0]
    busy = 0.0
    gaps = []  # (gap_ms, prev_name, next_name)
    cur_s, cur_e, prev_name = spans[0][0], spans[0][1], spans[0][2]
    for s, e, name in spans[1:]:
        if s > cur_e:
            gaps.append((s - cur_e, prev_name, name))
            busy += cur_e - cur_s
            cur_s = s
        cur_e = max(cur_e, e)
        if e == cur_e:
            prev_name = name
    busy += cur_e - cur_s
    print(f"\n-- sync timeline: span {wall:.2f} ms, busy {busy:.2f} ms "
          f"({100 * busy / wall:.1f}%), stall {wall - busy:.2f} ms in "
          f"{len(gaps)} gaps --")
    for g, a, b in sorted(gaps, key=lambda t: -t[0])[:topk]:
        print(f"  {g:7.3f} ms gap  after {a[:60]:60s} before {b[:60]}")
    return wall, busy, gaps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="morphfc_fused")
    ap.add_argument("--logdir", default="/tmp/vmg_xprof")
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--mode", default="summary",
                    choices=["summary", "scopes", "bins"],
                    help="summary: op/kind tables + gaps; scopes: every "
                         "sync op with full HLO metadata; bins: pool "
                         "itemization table")
    ap.add_argument("--reuse", action="store_true",
                    help="skip running/tracing; summarize the existing "
                         "logdir")
    args = ap.parse_args()

    if args.reuse:
        if args.mode == "scopes":
            dump_scope_stats(args.logdir, args.topk, min_ms=1.0)
        elif args.mode == "bins":
            print_bins(args.logdir, args.topk)
        else:
            per_op, per_kind, total = summarize_xplane(args.logdir,
                                                       args.topk)
            print(f"device total: {total:.2f} ms")
            for k, v in sorted(per_kind.items(), key=lambda kv: -kv[1])[
                    :args.topk]:
                print(f"{v:9.3f} ms  {k}")
            gap_analysis(args.logdir)
        return

    from vmg_tpu.utils.jax_setup import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vmg_tpu.train.precision import cast_params_for_compute
    from vmg_tpu.utils.profiling import timed

    T, H, W, C0 = 16, 180, 320, 112
    rng = np.random.default_rng(0)

    if args.what.startswith("morphfc"):
        from vmg_tpu.models.blocks import MorphFCDecay
        impl = "pallas" if "pallas" in args.what else "xla"
        if "s1" in args.what:
            H, W, C0, ck = 90, 160, 224, 16
        else:
            ck = 8
        m = MorphFCDecay(C0, ck, ck, channel_mixer="rcab",
                         fused="fused" in args.what or impl == "pallas",
                         impl=impl)
        x = jnp.asarray(rng.random((1, T, H, W, C0), dtype=np.float32),
                        jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.key(0), x)
        p = cast_params_for_compute(p, jnp.bfloat16)
        fn = jax.jit(m.apply)
        fargs = (p, x)
    elif args.what == "tab":
        from vmg_tpu.models.blocks import TAB
        m = TAB(dim=C0, chunk_h=int(45 * 0.125), chunk_w=int(80 * 0.125),
                mlp_ratio=6.0, n_groups=4, qkv_bias=True, if_decay=True,
                non_linear=True, gating=True, symm=True, symm_act="tanh",
                relu_scale=True, relu_scale_norm=False, ffn_type="ffn_cnn",
                mixer_type="mlps", mixer_n=None, mixer_scaling=1.0,
                channel_mixer="rcab")
        x = jnp.asarray(rng.random((1, T, H, W, C0), dtype=np.float32),
                        jnp.bfloat16)
        p = jax.jit(lambda k, v: m.init(k, v, True))(jax.random.key(2), x)
        p = cast_params_for_compute(p, jnp.bfloat16)
        fn = jax.jit(lambda p_, v: m.apply(p_, v, True))
        fargs = (p, x)
    elif args.what.startswith("traj"):
        from vmg_tpu.models.trajectory import TrajectoryMultiHead
        traj = TrajectoryMultiHead(embed_dim=C0, num_blocks=15,
                                   keyframe_stride=3, head=4, mode="wins",
                                   r_scaling=0.1, ltam=True, traj_win=16,
                                   win_impl="auto",
                                   flat_carry=args.what.endswith("flat"))
        xt = jnp.asarray(rng.random((1, T, H, W, C0), dtype=np.float32),
                         jnp.bfloat16)
        ff = jnp.asarray(rng.random((1, T - 1, H, W, 2), dtype=np.float32))
        fb = jnp.asarray(rng.random((1, T - 1, H, W, 2), dtype=np.float32))
        p = jax.jit(traj.init)(jax.random.key(1), xt, ff, fb)
        p = cast_params_for_compute(p, jnp.bfloat16)
        fn = jax.jit(lambda p_, a, b, c: traj.apply(p_, a, b, c))
        fargs = (p, xt, ff, fb)
    elif args.what == "model":
        from vmg_tpu.configs import FULL_PRESET
        from vmg_tpu.models import create_model
        from vmg_tpu.models.blocks import set_fast_gelu
        from vmg_tpu.models.spynet import set_fast_flow
        set_fast_gelu(True)  # match bench.py serving fast-math
        set_fast_flow(True)  # bench default since round 4
        model = create_model(FULL_PRESET, is_train=False, dtype=jnp.bfloat16)
        model_f32 = create_model(FULL_PRESET, is_train=False)
        x = jnp.asarray(rng.random((1, T, H, W, 3), dtype=np.float32))
        p = jax.jit(model_f32.init)(jax.random.key(0), x)
        p = cast_params_for_compute(p, jnp.bfloat16)
        fn = jax.jit(lambda p_, v: model.apply(p_, v))
        fargs = (p, x)
    else:
        raise SystemExit(f"unknown --what {args.what}")

    ms = timed(fn, *fargs) * 1e3
    print(f"wall: {ms:.2f} ms")
    with jax.profiler.trace(args.logdir):
        out = fn(*fargs)
        jax.tree.leaves(out)[0].block_until_ready()
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])

    if args.mode == "scopes":
        dump_scope_stats(args.logdir, args.topk, min_ms=1.0)
        return
    if args.mode == "bins":
        print_bins(args.logdir, args.topk)
        gap_analysis(args.logdir)
        return
    per_op, per_kind, total = summarize_xplane(args.logdir, args.topk)
    print(f"device total: {total:.2f} ms")
    print("\n-- by kind --")
    for k, v in sorted(per_kind.items(), key=lambda kv: -kv[1])[:args.topk]:
        print(f"{v:9.3f} ms  {100 * v / max(total, 1e-9):5.1f}%  {k}")
    print("\n-- top ops --")
    for k, v in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.topk]:
        print(f"{v:9.3f} ms  {k[:100]}")
    gap_analysis(args.logdir)


if __name__ == "__main__":
    main()
