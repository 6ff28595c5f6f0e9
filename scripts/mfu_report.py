"""Flagship-step efficiency report (VERDICT r3 item 7): edges/s/chip,
samples/s, estimated MFU and HBM utilization, plus the analytic DP-scaling
statement (per-step psum bytes vs ICI bandwidth) — the honest substitute
for multi-chip efficiency measurements on a one-chip image.

FLOP accounting is from the program structure (exact mults+adds of the TT
one-hot chain and the conv tower, fwd + bwd), byte accounting from the
tensors the step actually moves (h_all/d_h level activations dominate —
profile-attributed in round 3, logs/r3_profile.log).  Peak numbers used:
TPU v5e ~197 bf16 TFLOP/s, 819 GB/s HBM, ICI 4 links x ~45 GB/s/dir
(2D torus; jax-ml.github.io/scaling-book numbers).

Usage: python scripts/mfu_report.py <ms_per_step> [--bf16] [--json]
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np

PEAK_BF16 = 197e12     # v5e MXU, bf16 x bf16 -> f32
HBM_BW = 819e9         # B/s
ICI_LINK = 45e9        # B/s per link per direction
ICI_LINKS = 4


def products_step_model(bf16: bool):
    """FLOPs and HBM bytes of one products-config train step
    (B=1024, fanouts 5/10/15, D=100, H=256, C=47, TT p=125/140/140,
    q=5/5/4, r=16/16, --sparse fused-adam)."""
    B, fanouts, D, H, C = 1024, (5, 10, 15), 100, 256, 47
    p, q, r = (125, 140, 140), (5, 5, 4), (1, 16, 16, 1)
    block = 1024

    widths = [1]
    acc = 1
    for f in reversed(fanouts):
        acc *= f
        widths.append(acc)                      # [1, 15, 150, 750]
    n_ids = B * sum(widths)
    n_pad = -(-n_ids // block) * block          # kernel pads to block

    # TT kernel FLOPs (mults+adds): per index, per core k the one-hot
    # row-select is a (rows_k, p_k) x (p_k,) MXU product; the chain
    # contractions are rank-r FMAs over q-prefix segments.
    rows = [r[k] * q[k] * r[k + 1] for k in range(3)]
    onehot = sum(2 * p[k] * rows[k] for k in range(3))
    chain = 2 * (q[0] * r[1] * q[1] * r[2]      # level-1 fan-out FMAs
                 + q[0] * q[1] * r[2] * q[2])   # level-2 tree-sums
    fwd = n_pad * (onehot + chain)
    # backward chain: recompute fwd partials + per-core grad tiles + oh.T
    # scatter matmuls — ~2x the forward's index work, plus the tower d_h
    bwd = 2 * fwd
    tt_flops = fwd + bwd

    # conv tower: per layer li, per level pair, two (D_in -> D_out) GEMMs
    # (self + neigh) over B*width rows; backward = 2x forward
    dims = [D, H, H, C]
    tower = 0
    lv = widths  # level sizes outermost..innermost
    for li in range(3):
        for lev in range(3 - li):
            rows_bw = B * lv[lev]
            tower += 2 * rows_bw * dims[li] * dims[li + 1] * 2
    tower_flops = 3 * tower  # fwd + bwd(dW + dX)

    # HBM bytes: h_all + d_h (the dominant traffic) + tower activations
    # touched fwd+bwd + CSR sampling gathers
    el = 2 if bf16 else 4
    h_all = n_ids * D * el
    act = sum(B * lv[lev] * dims[0] for lev in range(4)) * el  # level-0 acts
    tower_act = 0
    cur = lv
    for li in range(3):
        cur = cur[:-1]
        tower_act += sum(B * w * dims[li + 1] for w in cur) * el
    sampling = B * sum(widths[1:]) * 4 * 2      # randint gathers + ids
    bytes_total = 3 * (h_all) + 2 * act + 3 * tower_act + sampling

    # DP psum payload: all trainable grads, f32
    n_params = (sum(p[k] * rows[k] for k in range(3))
                + sum(dims[i] * dims[i + 1] * 2 + 2 * dims[i + 1]
                      for i in range(3)))
    return dict(n_ids=n_ids, edges=B * sum(widths[1:]), samples=B,
                flops=tt_flops + tower_flops, bytes=bytes_total,
                tt_flops=tt_flops, tower_flops=tower_flops,
                psum_bytes=4 * n_params, n_params=n_params)


def main():
    ms = float(sys.argv[1]) if len(sys.argv) > 1 else 27.4
    bf16 = "--bf16" in sys.argv
    m = products_step_model(bf16)
    t = ms / 1e3
    mfu = m["flops"] / t / PEAK_BF16
    hbm = m["bytes"] / t / HBM_BW
    # ring allreduce over n chips: 2*(n-1)/n * bytes at ICI_LINKS links
    # (v5e 2D torus; grads are tiny so this is microseconds)
    bw = ICI_LINK * ICI_LINKS
    def eff(n):
        t_comm = 2 * (n - 1) / n * m["psum_bytes"] / bw
        return t / (t + t_comm)  # no-overlap (pessimistic) bound
    out = {
        "ms_per_step": ms, "bf16": bf16,
        "samples_per_s": round(m["samples"] / t),
        "edges_per_s": round(m["edges"] / t),
        "lookups_per_s": round(m["n_ids"] / t),
        "step_flops": m["flops"],
        "est_mfu_pct": round(100 * mfu, 2),
        "step_hbm_bytes": m["bytes"],
        "est_hbm_util_pct": round(100 * hbm, 1),
        "grad_psum_bytes": m["psum_bytes"],
        "params": m["n_params"],
        "analytic_dp_eff_pct": {str(n): round(100 * eff(n), 2)
                                for n in (2, 4, 8, 16, 64, 256)},
    }
    if "--json" in sys.argv:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k:>22}: {v}")


if __name__ == "__main__":
    main()
