#!/usr/bin/env python
"""Offline (CPU, no chip) decision probe for the v6 stream tracer on
the bench scene: replays the three bench waves (primary / mirror
bounce / shadow) through the PRODUCTION prep stage (live mask, octant
sub-slots, conservative fallback, slot score sort) and a NumPy model
of the emit walk.  Reports, per wave and configuration:

  slots / lockstep emit iterations (sum of per-8-group max steps)
  step-cap and PCAP overflow fractions
  emissions and phase-2 pair counts at refine sub sizes 32/16/8 and
  per-ray-exact block granularity
  estimated stage times from the measured unit costs
  (1.7 us per emit group-iteration, 0.61 us per pair)

Usage: python benchmarks/walk_sim3.py [npk_sample] [wave...]
  waves: primary bounce shadow (default all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

_FMAX = 3.4028235e38
EMIT_US = 1.7          # measured per 8-walk lockstep iteration
PAIR_US = 0.61         # measured per [128,16]x[16,512] pair (DEFAULT)


def walk_all_slots(nodef, scal, smeta, tmaxf, step_cap):
    """Vectorized lockstep walk over every slot.  Returns per-slot
    (steps, n_emit, capped, treelet_iters) and the emission list
    (slot_id, node_row, tn).  tmaxf: scalar or per-slot [nslot]
    array (temporal-bound clipping)."""
    nslot = scal.shape[0]
    tmaxf = np.broadcast_to(
        np.asarray(tmaxf, np.float32), (nslot,))
    sgn = scal[:, 0:3]
    olo = scal[:, 3:6]
    ohi = scal[:, 6:9]
    ilo = scal[:, 9:12]
    ihi = scal[:, 12:15]
    mixed = sgn == 0.0
    base = smeta[:, 2].astype(np.int64)
    alive0 = smeta[:, 1] > 0

    idx = np.where(alive0, 0, -1).astype(np.int64)
    steps = np.zeros(nslot, np.int64)
    emits = np.zeros(nslot, np.int64)
    twins = np.zeros(nslot, np.int64)    # treelet window entries (8)
    twins16 = np.zeros(nslot, np.int64)  # 16-row window entries
    prev_win = np.full(nslot, -1, np.int64)
    prev_win16 = np.full(nslot, -1, np.int64)
    em_slot, em_row, em_tn = [], [], []

    live = idx >= 0
    it = 0
    while live.any() and it < step_cap:
        it += 1
        rows = base + np.maximum(idx, 0)
        tile = nodef[rows]                       # [nslot, 16]
        a_f = tile[:, 8]
        esc = tile[:, 9]
        ntri = tile[:, 10]
        is_leaf = ntri > 0

        tn = np.zeros(nslot, np.float32)
        tf = tmaxf.copy()
        for k in range(3):
            m0 = sgn[:, k] * tile[:, k]
            m1 = sgn[:, k] * tile[:, 3 + k]
            near = np.minimum(m0, m1)
            far = np.maximum(m0, m1)
            lo = near - ohi[:, k]
            hi = far - olo[:, k]
            tnk = lo * np.where(lo >= 0, ilo[:, k], ihi[:, k])
            tfk = hi * np.where(hi >= 0, ihi[:, k], ilo[:, k])
            tn = np.maximum(tn, np.where(mixed[:, k], 0.0, tnk))
            tf = np.minimum(tf, np.where(mixed[:, k], _FMAX, tfk))
        box_hit = (tf >= tn) & (tn < tmaxf)
        emit = live & is_leaf & box_hit
        if emit.any():
            ei = np.nonzero(emit)[0]
            em_slot.append(ei)
            em_row.append(rows[ei])
            em_tn.append(tn[ei])
            emits[ei] += 1
        steps[live] += 1
        win = np.maximum(idx, 0) // 8
        new_win = live & (win != prev_win)
        twins[new_win] += 1
        prev_win = np.where(live, win, prev_win)
        win16 = np.maximum(idx, 0) // 16
        new16 = live & (win16 != prev_win16)
        twins16[new16] += 1
        prev_win16 = np.where(live, win16, prev_win16)

        nxt = np.where(is_leaf, esc, np.where(box_hit, a_f, esc))
        idx = np.where(live, nxt.astype(np.int64), idx)
        live = idx >= 0
    capped = live.copy()
    if em_slot:
        em = (np.concatenate(em_slot), np.concatenate(em_row),
              np.concatenate(em_tn))
    else:
        em = (np.zeros(0, np.int64),) * 3
    return steps, emits, capped, (twins, twins16), em


def pair_counts(nodef, em_slot, em_row, slot_pkt, rows_np, live_np,
                tmaxf, em_tn=None, tfinal=None):
    """Pair counts for refine granularities 32/16/8 and exact.  With
    em_tn + tfinal (true closest-hit t per ray), also reports the
    PERFECT-CULL ceiling: exact pairs whose packet-level leaf tn is
    within the block's worst final best-t -- the number of matmuls a
    tq-ordered (near-first) word list would leave for the isect
    kernel's occlusion cull in the best case.  Blocks containing any
    live ray that ultimately misses can never cull (their worst best
    stays FLT_MAX)."""
    ox, oy, oz, dx, dy, dz = rows_np
    out = {}
    E = len(em_slot)
    if E == 0:
        return {f"pairs{g}": 0 for g in (32, 16, 8)} | {"pairs_exact": 0}
    leaf = nodef[em_row]                          # [E, 16]
    pkts = slot_pkt[em_slot]                      # [E]
    for gran in (32, 16, 8):
        nsub = 1024 // gran
        # per-(emission, sub) interval test, chunked over emissions
        total = 0
        for c0 in range(0, E, 8192):
            sl = slice(c0, min(c0 + 8192, E))
            p = pkts[sl]
            lf = leaf[sl]
            keepblk = np.zeros((len(p), 8), bool)
            # sub s covers rays [pkt*1024 + s*gran, ... + gran)
            tn = np.zeros((len(p), nsub), np.float32)
            tf = np.full((len(p), nsub), tmaxf, np.float32)
            for k, (oc, dc) in enumerate(((ox, dx), (oy, dy),
                                          (oz, dz))):
                o_s = oc.reshape(-1, gran)
                d_s = dc.reshape(-1, gran)
                m_s = live_np.reshape(-1, gran)
                big = 1e30
                dmin = np.min(np.where(m_s, d_s, big), 1)
                dmax = np.max(np.where(m_s, d_s, -big), 1)
                sgn = np.where(dmin > 0, 1.0,
                               np.where(dmax < 0, -1.0, 0.0))
                osn = o_s * np.where(dmax < 0, -1.0, 1.0)[:, None]
                olo = np.min(np.where(m_s, osn, big), 1)
                ohi = np.max(np.where(m_s, osn, -big), 1)
                inv = np.minimum(1.0 / np.maximum(np.abs(d_s), 1e-30),
                                 big)
                ilo = np.min(np.where(m_s, inv, big), 1)
                ihi = np.max(np.where(m_s, inv, 0.0), 1)
                # gather this chunk's packets' subs: [len(p), nsub]
                sub0 = p[:, None] * nsub + np.arange(nsub)[None, :]
                sgn_c = sgn[sub0]
                m0 = sgn_c * lf[:, k:k + 1]
                m1 = sgn_c * lf[:, 3 + k:4 + k]
                near = np.minimum(m0, m1)
                far = np.maximum(m0, m1)
                lo = near - ohi[sub0]
                hi = far - olo[sub0]
                tnk = lo * np.where(lo >= 0, ilo[sub0], ihi[sub0])
                tfk = hi * np.where(hi >= 0, ihi[sub0], ilo[sub0])
                mk = sgn_c == 0.0
                tn = np.maximum(tn, np.where(mk, 0.0, tnk))
                tf = np.minimum(tf, np.where(mk, _FMAX, tfk))
            keep = (tf >= tn) & (tn < tmaxf)      # [chunk, nsub]
            spb = nsub // 8
            keepblk = keep.reshape(len(p), 8, spb).any(2)
            total += int(keepblk.sum())
        out[f"pairs{gran}"] = total
    # exact per-(emission, block): any LIVE ray's slab interval hits
    total = 0
    total_cull = 0
    for c0 in range(0, E, 1024):
        sl = slice(c0, min(c0 + 1024, E))
        p = pkts[sl]
        lf = leaf[sl]
        ridx = p[:, None] * 1024 + np.arange(1024)[None, :]
        tn = np.zeros((len(p), 1024), np.float32)
        tf = np.full((len(p), 1024), tmaxf, np.float32)
        for k, (oc, dc) in enumerate(((ox, dx), (oy, dy), (oz, dz))):
            o_r = oc[ridx]
            d_r = dc[ridx]
            inv = 1.0 / np.where(np.abs(d_r) < 1e-30, np.inf, d_r)
            t0 = (lf[:, k:k + 1] - o_r) * inv
            t1 = (lf[:, 3 + k:4 + k] - o_r) * inv
            tn = np.maximum(tn, np.minimum(t0, t1))
            tf = np.minimum(tf, np.maximum(t0, t1))
        ok = (tf >= np.maximum(tn, 0.0)) & (tn < tmaxf) & live_np[ridx]
        okb = ok.reshape(len(p), 8, 128).any(2)
        total += int(okb.sum())
        out["pairs_exact32"] = out.get("pairs_exact32", 0) + int(
            ok.reshape(len(p), 32, 32).any(2).sum())
        if em_tn is not None and tfinal is not None:
            lv = live_np[ridx].reshape(len(p), 8, 128)
            tfin = tfinal[ridx].reshape(len(p), 8, 128)
            bound = np.where(lv, tfin, -np.inf).max(2)  # [chunk, 8]
            wtn = em_tn[sl][:, None]                 # packet-level tn
            total_cull += int((okb & (wtn <= bound)).sum())
    out["pairs_exact"] = total
    if em_tn is not None and tfinal is not None:
        out["pairs_cull_ceiling"] = total_cull
    return out


def report(tag, nodef, scal, smeta, order, slot_pkt_sorted, rows_np,
           live_np, step_cap=2048, tmaxf=1e4, tfinal=None,
           walk_tmax=None, extra=None):
    """walk_tmax: optional per-slot walk clip (temporal bounds);
    pair-stage interval math stays at the scalar tmaxf.  extra: dict
    merged into the JSON line (e.g. residual-ray stats)."""
    scal = np.asarray(scal)
    smeta = np.asarray(smeta)
    steps, emits, capped, (twins, twins16), (es, er, etn) = \
        walk_all_slots(nodef, scal, smeta,
                       tmaxf if walk_tmax is None else walk_tmax,
                       step_cap)
    alive = smeta[:, 1] > 0
    nslot = scal.shape[0]
    # slots are already in score order; lockstep cost = sum of group max
    g = steps.reshape(-1, 8)
    iters = int(g.max(1).sum())
    balance = iters / max(steps.sum() / 8.0, 1.0)
    t_iters = int(np.ceil(twins.reshape(-1, 8).max(1)).sum())
    t16_iters = int(np.ceil(twins16.reshape(-1, 8).max(1)).sum())

    def ws_makespan(per_slot):
        """Exact iteration count of the work-stealing kernel: 8 rows,
        each retire immediately pulls the next slot from the cursor
        (greedy list scheduling; rows advance one iteration per kernel
        iteration, so makespan == max row finish time)."""
        import heapq
        h = [0] * 8
        for s in per_slot:
            heapq.heappush(h, heapq.heappop(h) + int(s))
        return max(h)

    ws_iters = ws_makespan(steps)
    wst_iters = ws_makespan(np.ceil(twins).astype(np.int64))
    pc = pair_counts(nodef, es, er, smeta[:, 0].astype(np.int64),
                     rows_np, live_np, tmaxf, em_tn=etn,
                     tfinal=tfinal)
    em_per = emits[alive]
    line = {
        "wave": tag,
        "slots_alive": int(alive.sum()),
        "emit_group_iters": iters,
        "emit_est_ms": round(iters * EMIT_US / 1e3, 1),
        "emit_balance": round(balance, 2),
        "treelet_group_iters": t_iters,
        "treelet_est_ms": round(t_iters * EMIT_US / 1e3, 1),
        "treelet16_group_iters": t16_iters,
        "ws_iters": ws_iters,
        "ws_est_ms": round(ws_iters * EMIT_US / 1e3, 1),
        "ws_treelet_iters": wst_iters,
        "ws_treelet_est_ms": round(wst_iters * EMIT_US / 1e3, 1),
        "capped_frac": round(float(capped[alive].mean()), 4)
        if alive.any() else 0.0,
        "pcap_over_frac": round(float((em_per > 1024).mean()), 4)
        if alive.any() else 0.0,
        "emissions": int(emits.sum()),
    }
    for k, v in pc.items():
        line[k] = v
        line[k + "_est_ms"] = round(v * PAIR_US / 1e3, 1)
    if extra:
        line.update(extra)
    import json
    print(json.dumps(line), flush=True)


def main():
    import bench
    from phase_ledger import bench_rays
    from radiance_tpu.ops import stream3 as s3
    from radiance_tpu.ops import traversal

    npk_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    waves = sys.argv[2:] or ["primary", "bounce", "shadow"]

    scene = bench.build_or_load_scene()
    o0, d0 = bench_rays()
    # stride-sample whole packets for representative stats
    npk_all = len(o0) // 1024
    stride = max(npk_all // npk_sample, 1)
    sel = (np.arange(npk_sample)[:, None] * stride * 1024
           + np.arange(1024)[None, :]).reshape(-1)
    sel = sel[sel < len(o0)]
    o = o0[sel].astype(np.float32)
    d = d0[sel].astype(np.float32)
    n = len(o)
    print(f"# sampled {n} rays ({len(sel)//1024} packets) of "
          f"{len(o0)}", file=sys.stderr)

    nodef = np.asarray(scene.knode_f)
    inv0 = np.asarray(scene.inst_inv[0])

    t1 = hit = o2 = d2 = None
    light = np.tile(bench.light_vec(), (n, 1))

    def trace_cpu(ow, dw, tmx=1e4):
        outs = []
        CH = 65536
        jw = jax.jit(lambda oo, dd: traversal.trace_rays(
            scene, oo, dd, 1e-3, tmx).t)
        for c0 in range(0, n, CH):
            oo = jnp.asarray(ow[c0:c0 + CH])
            dd = jnp.asarray(dw[c0:c0 + CH])
            if oo.shape[0] < CH:
                padn = CH - oo.shape[0]
                oo = jnp.concatenate([oo, oo[:padn]])
                dd = jnp.concatenate([dd, dd[:padn]])
                outs.append(np.asarray(jw(oo, dd))[:n - c0])
            else:
                outs.append(np.asarray(jw(oo, dd)))
        return np.concatenate(outs)

    def run(tag, ow, dw, live, presort, tmaxf=1e4):
        ow = np.nan_to_num(ow, nan=1e30, posinf=1e30, neginf=-1e30)
        rows_w = tuple(jnp.asarray(ow[:, k]) for k in range(3)) + \
            tuple(jnp.asarray(dw[:, k]) for k in range(3))
        lv = None if live is None else jnp.asarray(live)
        if presort:
            if lv is not None:
                rows_w, _, lv = s3._block_sort(rows_w, lv)
            else:
                rows_w, _ = s3._block_sort(rows_w)
        out = jax.jit(s3._stage_prep)(
            rows_w, jnp.float32(1e-3), jnp.float32(1e4),
            jnp.asarray(nodef), jnp.asarray(inv0), lv)
        rows, feats_t, scal, smeta, bscal, lim, order = \
            jax.block_until_ready(out)
        rows_np = tuple(np.asarray(r) for r in rows)
        npad = rows_np[0].shape[0]
        if lv is None:
            live_np = np.ones(npad, bool)
        else:
            live_np = np.asarray(lv)
            if len(live_np) < npad:     # prep pads dead lanes
                live_np = np.concatenate(
                    [live_np, np.zeros(npad - len(live_np), bool)])
        tfinal = None
        if os.environ.get("SIM_CULL", "1") == "1":
            tf_w = trace_cpu(ow, dw, tmaxf)
            npadw = rows_np[0].shape[0]
            tfinal = np.full(npadw, _FMAX, np.float32)
            tfinal[:len(tf_w)] = tf_w
            if presort:
                # rays were block-permuted by _block_sort; tfinal must
                # follow (recompute from the sorted rows is wrong for
                # object space; permute instead)
                tfinal = None   # presort variants skip the cull bound
        report(tag, nodef, scal, smeta, np.asarray(order),
               None, rows_np, live_np, tmaxf=tmaxf, tfinal=tfinal)

    def run_tbound(tag, ow, dw, bound, t_true):
        """Temporal-bound variant: per-slot walk clip at the packet's
        worst previous-sample t, per-block pair cull at the block's
        (pairs_cull_ceiling with tfinal=bound), plus exact residual
        accounting -- rays whose true t exceeds their block bound
        need an unbounded re-walk to stay exact."""
        rows_w = tuple(jnp.asarray(ow[:, k]) for k in range(3)) + \
            tuple(jnp.asarray(dw[:, k]) for k in range(3))
        out = jax.jit(s3._stage_prep)(
            rows_w, jnp.float32(1e-3), jnp.float32(1e4),
            jnp.asarray(nodef), jnp.asarray(inv0), None)
        rows, feats_t, scal, smeta, bscal, lim, order = \
            jax.block_until_ready(out)
        rows_np = tuple(np.asarray(r) for r in rows)
        npad = rows_np[0].shape[0]
        live_np = np.ones(npad, bool)
        bnd = np.full(npad, _FMAX, np.float32)
        bnd[:len(bound)] = bound
        smeta_np = np.asarray(smeta)
        pkt_bound = bnd.reshape(-1, 1024).max(1)          # [npk]
        walk_tmax = np.minimum(
            pkt_bound[smeta_np[:, 0].astype(np.int64)], 1e4)
        blk_bound = bnd.reshape(-1, 128).max(1)           # [npk*8]
        tt = np.full(npad, _FMAX, np.float32)
        tt[:len(t_true)] = t_true
        resid = tt > blk_bound.repeat(128)
        extra = {
            "resid_rays": int(resid.sum()),
            "resid_frac": round(float(resid.mean()), 5),
            "pkt_bound_inf_frac": round(
                float((pkt_bound >= 1e4).mean()), 4),
        }
        report(tag, nodef, scal, smeta, np.asarray(order),
               None, rows_np, live_np, tmaxf=1e4, tfinal=bnd,
               walk_tmax=walk_tmax, extra=extra)

    if {"bounce", "shadow", "ggx"} & set(waves):
        t1 = trace_cpu(o, d)
        hit = t1 < _FMAX
        hp = o + t1[:, None] * d
        nrm = o - hp
        nn = np.linalg.norm(nrm, axis=-1, keepdims=True)
        nrm = np.where(nn > 0, nrm / np.maximum(nn, 1e-30), 0.0)
        dd2 = d - 2 * np.sum(d * nrm, -1, keepdims=True) * nrm
        o2 = np.where(hit[:, None], hp + nrm * 1e-3, o)
        d2 = np.where(hit[:, None], dd2, -d)
        print(f"# hit rate {hit.mean():.3f}", file=sys.stderr)

    near = float(os.environ.get("SIM_NEAR", "8"))
    for w in waves:
        if w == "primary":
            run("primary", o, d, None, False)
        elif w == "ggx":
            # engine-shaped bounce: random hemisphere directions at the
            # hit points (every packet octant-scrambled).  Decides the
            # engine route: octant sub-slot pool (RADIANCE_EXTRA) in
            # pixel order vs the element coherence sort.
            rng = np.random.default_rng(3)
            dg = rng.normal(size=(n, 3)).astype(np.float32)
            dg /= np.linalg.norm(dg, axis=-1, keepdims=True)
            og = np.where(hit[:, None], o + t1[:, None] * d, o)
            run("ggx/live", og, dg, hit, False)
            tg = trace_cpu(og, dg)
            run(f"ggx/cascA{near}", og, dg, hit, False, tmaxf=near)
            run(f"ggx/cascB{near}", og, dg, hit & (tg >= near), False)
            # element sort (the engine's argsort path): octant then
            # origin morton, live first
            from radiance_tpu.ops import packet_trace
            key = np.asarray(packet_trace.coherence_key(
                jnp.asarray(og), jnp.asarray(dg)))
            key = np.where(hit, key, 2 ** 31 - 1)
            perm = np.argsort(key, kind="stable")
            run("ggx/elemsort", og[perm], dg[perm], hit[perm], False)
        elif w == "bounce":
            run("bounce/nolive", o2, d2, None, False)
            run("bounce/live", o2, d2, hit, False)
            run("bounce/live+ps", o2, d2, hit, True)
            t2 = trace_cpu(np.nan_to_num(o2, nan=1e30), d2)
            run(f"bounce/cascA{near}", o2, d2, hit, False, tmaxf=near)
            liveB = hit & (t2 >= near)
            run(f"bounce/cascB{near}", o2, d2, liveB, False)
        elif w == "tprim":
            # progressive temporal bounds: sample A's per-pixel t
            # clips sample B's walk and pairs (jittered pinhole, the
            # engine's PCG sub-pixel jitter via bench.camera_rays)
            oA, dA = bench.camera_rays(jitter=11)
            oB, dB = bench.camera_rays(jitter=12)
            oA = oA[sel].astype(np.float32)
            dA = dA[sel].astype(np.float32)
            oB = oB[sel].astype(np.float32)
            dB = dB[sel].astype(np.float32)
            tA = trace_cpu(oA, dA)
            tB = trace_cpu(oB, dB)
            bound = np.where(tA >= 1e4, _FMAX,
                             tA * 1.0001 + 1e-4).astype(np.float32)
            run("tprim/base", oB, dB, None, False)
            run_tbound("tprim/bound", oB, dB, bound, tB)
        elif w == "shadow":
            run("shadow/live", o2, light, hit, False)
            run("shadow/live+ps", o2, light, hit, True)
            t3 = trace_cpu(np.nan_to_num(o2, nan=1e30), light)
            run(f"shadow/cascA{near}", o2, light, hit, False,
                tmaxf=near)
            liveB = hit & (t3 >= near)
            run(f"shadow/cascB{near}", o2, light, liveB, False)


if __name__ == "__main__":
    main()
