"""Bisect which construct in the packed raycast kernel stalls Mosaic.

Usage: python artifacts/packed_bisect.py CASE
CASE in: m2only, m2noroll, m1only, m2novisit, m2const
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")

CASE = sys.argv[1]
W, A, S = 8, 32, 32
half = A // 2
P = 4
_INF = 3.0e38


def kern(offs_ref, pkx_ref, pky_ref, pkh_ref, pks_ref,
         cx_s, cy_s, cslot_s, cspec_s, n_s, mode_s,
         depth_ref, sem_ref, find_ref):
    offs = offs_ref[...].reshape(S, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1)
    half0 = lane < half
    r2 = jnp.float32(1.0)
    near = jnp.float32(1.1)

    for p in range(P):
        w0, w1 = 2 * p, 2 * p + 1
        run_packed = (CASE not in ("m1only", "both2"))
        if CASE in ("m1only", "both", "both2"):
            @pl.when(mode_s[p, 0] == 0)
            def _m1(p=p, w0=w0, w1=w1):
                for w in (w0, w1):
                    px = pkx_ref[p:p + 1, :]
                    py = pky_ref[p:p + 1, :]
                    hd = pkh_ref[p:p + 1, :]
                    ang = hd + offs
                    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
                    cos_h, sin_h = jnp.cos(hd), jnp.sin(hd)

                    def one1(b, carry, w=w, px=px, py=py, cos_a=cos_a,
                             sin_a=sin_a, cos_h=cos_h, sin_h=sin_h):
                        t_min, sem_min, f_min, f_arg = carry
                        bh = jnp.minimum(b, half - 1)
                        tx = jnp.full((1, A), cx_s[w, bh])
                        ty = jnp.full((1, A), cy_s[w, bh])
                        tslot = jnp.full((1, A), cslot_s[w, bh])
                        tsp = jnp.full((1, A), cspec_s[w, bh])
                        valid = jnp.full((1, A), n_s[w, 0] > b)
                        ocx = tx - px
                        ocy = ty - py
                        oc2 = ocx * ocx + ocy * ocy
                        ok = valid & (lane != tslot)
                        q = jnp.where(ok, r2 - oc2, -_INF)
                        t_c = cos_a * ocx + sin_a * ocy
                        disc = t_c * t_c + q
                        t_hit = t_c - jnp.sqrt(jnp.maximum(disc, 0.0))
                        thit_v = jnp.where((disc >= 0) & (t_hit > near),
                                           t_hit, _INF)
                        closer = thit_v < t_min
                        t_min = jnp.minimum(thit_v, t_min)
                        sem_min = jnp.where(closer, tsp, sem_min)
                        ft_c = cos_h * ocx + sin_h * ocy
                        fdisc = ft_c * ft_c + q
                        ft = ft_c - jnp.sqrt(jnp.maximum(fdisc, 0.0))
                        ft_v = jnp.where((fdisc >= 0) & (ft > near), ft, _INF)
                        fcloser = ft_v < f_min
                        f_min = jnp.minimum(ft_v, f_min)
                        f_arg = jnp.where(fcloser, tslot, f_arg)
                        return t_min, sem_min, f_min, f_arg

                    def body1(i, carry, one1=one1):
                        for j in range(4):
                            carry = one1(4 * i + j, carry)
                        return carry

                    init = (jnp.full((S, A), _INF, jnp.float32),
                            jnp.zeros((S, A), jnp.int32),
                            jnp.full((1, A), _INF, jnp.float32),
                            jnp.full((1, A), -1, jnp.int32))
                    t_a, sem_a, f_t, f_arg = jax.lax.fori_loop(
                        0, A // 4, body1, init)
                    d = jnp.minimum(t_a, 100.0).astype(jnp.int32)
                    depth_ref[w] = d.astype(jnp.uint8)
                    sem_ref[w] = sem_a.astype(jnp.int8)
                    find_ref[w:w + 1, :] = f_arg

        if run_packed:
            cond = (mode_s[p, 0] == 1) if CASE != "m2const" else (p >= 0)

            @pl.when(cond if CASE != "m2const" else mode_s[p, 0] >= 0)
            def _pk(p=p, w0=w0, w1=w1):
                px = pkx_ref[p:p + 1, :]
                py = pky_ref[p:p + 1, :]
                hd = pkh_ref[p:p + 1, :]
                srcslot = pks_ref[p:p + 1, :]
                ang = hd + offs
                cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
                cos_h, sin_h = jnp.cos(hd), jnp.sin(hd)
                n0 = n_s[w0, 0]
                n1 = n_s[w1, 0]
                nv = jnp.where(half0, n0, n1)

                def one(b, carry):
                    t_min, sem_min, f_min, f_arg = carry
                    if CASE == "m2novisit":
                        return carry
                    b_safe = jnp.minimum(b, half - 1)
                    tx = jnp.where(half0, cx_s[w0, b_safe], cx_s[w1, b_safe])
                    ty = jnp.where(half0, cy_s[w0, b_safe], cy_s[w1, b_safe])
                    tslot = jnp.where(half0, cslot_s[w0, b_safe],
                                      cslot_s[w1, b_safe])
                    tsp = jnp.where(half0, cspec_s[w0, b_safe],
                                    cspec_s[w1, b_safe])
                    valid = nv > b
                    ocx = tx - px
                    ocy = ty - py
                    oc2 = ocx * ocx + ocy * ocy
                    ok = valid & (srcslot != tslot)
                    q = jnp.where(ok, r2 - oc2, -_INF)
                    t_c = cos_a * ocx + sin_a * ocy
                    disc = t_c * t_c + q
                    t_hit = t_c - jnp.sqrt(jnp.maximum(disc, 0.0))
                    thit_v = jnp.where((disc >= 0) & (t_hit > near), t_hit, _INF)
                    closer = thit_v < t_min
                    t_min = jnp.minimum(thit_v, t_min)
                    sem_min = jnp.where(closer, tsp, sem_min)
                    ft_c = cos_h * ocx + sin_h * ocy
                    fdisc = ft_c * ft_c + q
                    ft = ft_c - jnp.sqrt(jnp.maximum(fdisc, 0.0))
                    ft_v = jnp.where((fdisc >= 0) & (ft > near), ft, _INF)
                    fcloser = ft_v < f_min
                    f_min = jnp.minimum(ft_v, f_min)
                    f_arg = jnp.where(fcloser, tslot, f_arg)
                    return t_min, sem_min, f_min, f_arg

                def body(i, carry):
                    for j in range(4):
                        carry = one(4 * i + j, carry)
                    return carry

                nmax = jnp.maximum(n0, n1)
                init = (jnp.full((S, A), _INF, jnp.float32),
                        jnp.zeros((S, A), jnp.int32),
                        jnp.full((1, A), _INF, jnp.float32),
                        jnp.full((1, A), -1, jnp.int32))
                t_a, sem_a, f_t, f_arg = jax.lax.fori_loop(
                    0, (nmax + 3) // 4, body, init)
                if CASE in ("walls", "both"):
                    safe = lambda dd: jnp.where(dd == 0, 1.0, dd)
                    limx, limy = jnp.float32(127.0), jnp.float32(95.0)
                    tx_w = jnp.minimum(
                        jnp.where(cos_a > 0, (limx - px) / safe(cos_a), _INF),
                        jnp.where(cos_a < 0, -px / safe(cos_a), _INF))
                    ty_w = jnp.minimum(
                        jnp.where(sin_a > 0, (limy - py) / safe(sin_a), _INF),
                        jnp.where(sin_a < 0, -py / safe(sin_a), _INF))
                    t_wall = jnp.minimum(tx_w, ty_w)
                    t_wall = jnp.where(t_wall > near, t_wall, _INF)
                    t_a = jnp.minimum(t_a, t_wall)
                d = jnp.minimum(t_a, 100.0).astype(jnp.int32)
                use_roll = CASE != "m2noroll"
                for w, sel in ((w0, lambda x: x),
                               (w1, (lambda x: pltpu.roll(x, half, 1))
                                if use_roll else (lambda x: x))):
                    depth_ref[w] = jnp.where(half0, d, 0).astype(jnp.uint8)
                    sem_ref[w] = jnp.where(half0, sel(sem_a), -1).astype(jnp.int8)
                    find_ref[w:w + 1, :] = jnp.where(half0, sel(f_arg), -1)


def main():
    offs = jnp.linspace(-0.7, 0.7, S).reshape(1, S)
    pk = jnp.zeros((W // 2, A), jnp.float32)
    pki = jnp.zeros((W // 2, A), jnp.int32)
    c = jnp.zeros((W, half), jnp.float32)
    ci = jnp.zeros((W, half), jnp.int32)
    n = jnp.full((W, 1), 5, jnp.int32)
    mode = jnp.ones((W // 2, 1), jnp.int32)

    vm = pltpu.VMEM
    sm = pltpu.SMEM
    b1 = pl.BlockSpec((P, A), lambda i: (i, 0), memory_space=vm)
    offs_spec = pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=vm)
    s2h = pl.BlockSpec((2 * P, half), lambda i: (i, 0), memory_space=sm)
    s2n = pl.BlockSpec((2 * P, 1), lambda i: (i, 0), memory_space=sm)
    s1m = pl.BlockSpec((P, 1), lambda i: (i, 0), memory_space=sm)
    out3 = pl.BlockSpec((2 * P, S, A), lambda i: (i, 0, 0), memory_space=vm)
    out2 = pl.BlockSpec((2 * P, A), lambda i: (i, 0), memory_space=vm)

    f = pl.pallas_call(
        kern, grid=(W // (2 * P),),
        in_specs=[offs_spec, b1, b1, b1, b1, s2h, s2h, s2h, s2h, s2n, s1m],
        out_specs=(out3, out3, out2),
        out_shape=(jax.ShapeDtypeStruct((W, S, A), jnp.uint8),
                   jax.ShapeDtypeStruct((W, S, A), jnp.int8),
                   jax.ShapeDtypeStruct((W, A), jnp.int32)))
    t0 = time.time()
    out = jax.device_get(f(offs, pk, pk, pk, pki, c, c, ci, ci, n, mode))
    print(CASE, "ok", round(time.time() - t0, 1), "s", flush=True)


main()
