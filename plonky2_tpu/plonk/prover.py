"""The PLONK prover (reference: plonky2/src/plonk/prover.rs:144-392).

Host drives witness generation and the transcript; all O(N) math —
wire/Z/quotient polynomial construction, commitments, FRI — runs as
device kernels.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import extension as ge
from ..field import goldilocks as gl
from ..fri import oracle as fo
from ..hash import poseidon as hp
from ..hash.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..iop.witness import PartialWitness
from ..ops import gf, ntt
from ..utils.bits import log2_strict, reverse_index_bits_perm
from .circuit_data import (
    ORACLE_BLINDING,
    ORACLE_QUOTIENT,
    ORACLE_WIRES,
    ORACLE_ZS_PARTIAL_PRODUCTS,
    CommonCircuitData,
    ProverOnlyCircuitData,
)
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import NUM_COINS_LOOKUP, get_lut_poly_eval, quotient_values_fn

Ext = Tuple[int, int]


def prove(
    prover_data: ProverOnlyCircuitData,
    common: CommonCircuitData,
    inputs: PartialWitness,
    gc=None,
) -> ProofWithPublicInputs:
    """gc: GenericConfig hasher bundle (the reference's `C` type
    parameter); defaults to PoseidonGoldilocksConfig."""
    from .generic_config import poseidon_goldilocks_config

    gc = gc or poseidon_goldilocks_config()
    hasher = gc.hasher
    config = common.config
    nc = config.num_challenges
    fri_config = config.fri_config

    from ..utils import profiling as prof

    # 1. witness generation (host fixpoint)
    with prof.annotate("prove/witness"):
        partition_witness = generate_partial_witness(inputs, prover_data, common)
    set_lookup_wires(prover_data, common, partition_witness)
    public_inputs = partition_witness.get_targets(prover_data.public_inputs)
    public_inputs_hash = gc.inner_hasher.hash_no_pad(public_inputs)
    witness = partition_witness.full_witness()
    has_lookup = common.num_lookup_polys != 0

    from . import device_transcript as dt

    if dt.eligible(common, gc, has_lookup):
        # everything after witness generation runs with the Fiat-Shamir
        # transcript resident on device — no host syncs until assembly
        with prof.annotate("prove/device-transcript"):
            return dt.prove_device_transcript(
                prover_data, common, partition_witness, public_inputs,
                public_inputs_hash, gc,
            )

    # 2. oracle 1 — wires
    wires_dev = gf.from_u64(witness.wire_values)  # [num_wires, n]
    with prof.annotate("prove/commit-wires"):
        wires_commitment = fo.PolynomialBatch.from_values(
            wires_dev,
            fri_config.rate_bits,
            common.config.zero_knowledge and ORACLE_BLINDING[ORACLE_WIRES],
            fri_config.cap_height,
            hasher=hasher,
        )

    # 3. Fiat-Shamir head (Appendix A order)
    challenger = Challenger(permutation=hasher.permutation)
    common.fri_params.observe(challenger)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.cap_u64())
    betas = challenger.get_n_challenges(nc)
    gammas = challenger.get_n_challenges(nc)
    if has_lookup:
        additional = challenger.get_n_challenges(NUM_COINS_LOOKUP * nc - 2 * nc)
        deltas = betas + gammas + additional
    else:
        deltas = []

    # 4. permutation argument: Z + partial products (host numpy, vectorized)
    with prof.annotate("prove/zs-partial-products"):
        zs_pp_np = _zs_and_partial_products(witness, betas, gammas, prover_data, common)
    if has_lookup:
        lookup_np = compute_all_lookup_polys(witness, deltas, prover_data, common)
        zs_pp_np = np.concatenate([zs_pp_np, lookup_np], axis=0)
    zs_pp_commitment = fo.PolynomialBatch.from_values(
        gf.from_u64(zs_pp_np),
        fri_config.rate_bits,
        common.config.zero_knowledge and ORACLE_BLINDING[ORACLE_ZS_PARTIAL_PRODUCTS],
        fri_config.cap_height,
        hasher=hasher,
    )
    challenger.observe_cap(zs_pp_commitment.cap_u64())
    alphas = challenger.get_n_challenges(nc)

    # 5. quotient (device kernel over the whole coset)
    with prof.annotate("prove/quotient"):
        quotient_chunks = _compute_quotient_polys(
            common,
            prover_data,
            public_inputs_hash,
            wires_commitment,
            zs_pp_commitment,
            betas,
            gammas,
            alphas,
            deltas,
        )
    quotient_commitment = fo.PolynomialBatch.from_coeffs(
        quotient_chunks,
        fri_config.rate_bits,
        common.config.zero_knowledge and ORACLE_BLINDING[ORACLE_QUOTIENT],
        fri_config.cap_height,
        hasher=hasher,
    )
    challenger.observe_cap(quotient_commitment.cap_u64())

    # 6. zeta + openings
    zeta = challenger.get_extension_challenge(2)
    n_bits = common.degree_bits
    assert ge.ext_exp(zeta, 1 << n_bits) != ge.ext_one(2), "zeta in subgroup"

    oracles = [
        prover_data.constants_sigmas_commitment,
        wires_commitment,
        zs_pp_commitment,
        quotient_commitment,
    ]
    g = gl.primitive_root_of_unity(n_bits)
    zeta_next = ge.ext_scalar_mul(zeta, g)
    # every oracle at zeta and g*zeta in one dispatch (the per-oracle
    # variant costs a device sync each — dominant over a TPU tunnel)
    (
        cs_evals,
        wires_evals,
        zs_pp_evals,
        q_evals,
        _cs_next,
        _wires_next,
        zs_pp_next_evals,
        _q_next,
    ) = fo.eval_commitments_at(oracles, zeta, zeta_next)
    nzs = common.num_zs_partial_products_polys()
    openings = OpeningSet(
        constants=cs_evals[common.constants_range().start : common.constants_range().stop],
        plonk_sigmas=cs_evals[common.sigmas_range().start : common.sigmas_range().stop],
        wires=wires_evals,
        plonk_zs=zs_pp_evals[: nc],
        plonk_zs_next=zs_pp_next_evals[: nc],
        partial_products=zs_pp_evals[nc : nzs],
        quotient_polys=q_evals,
        lookup_zs=zs_pp_evals[nzs:],
        lookup_zs_next=zs_pp_next_evals[nzs:],
    )
    fri_openings = openings.to_fri_openings()
    for batch in fri_openings.batches:
        challenger.observe_extension_elements(batch.values)

    # 7. FRI opening proof
    instance = common.get_fri_instance(zeta)
    with prof.annotate("prove/fri"):
        opening_proof = fo.prove_openings(
            instance, oracles, challenger, common.fri_params, hasher=hasher
        )

    proof = Proof(
        wires_cap=wires_commitment.cap_u64(),
        plonk_zs_partial_products_cap=zs_pp_commitment.cap_u64(),
        quotient_polys_cap=quotient_commitment.cap_u64(),
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)


# ---------------------------------------------------------------------------
# Permutation argument (prover.rs:396-480) — vectorized numpy on host.
# Sequential-looking prefix products become log-doubling scans; the row
# quotient computation is one batched inverse.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _zs_device_fn(nc: int, n: int, nr: int, chunk: int, num_prods: int):
    """Device dual of _zs_and_partial_products: the permutation argument
    entirely on device (chunk products, log-doubling prefix products,
    associative-scan batch inverse) so the device-transcript prover can
    consume traced betas/gammas with no host sync (prover.rs:396-480)."""

    @jax.jit
    def partial_products_fn(wires, sigmas, s_id, betas, gammas):
        # wires/sigmas/s_id: [n, nr] limb pairs; betas/gammas: [nc] pairs
        def bview(x, c):
            return (
                jnp.broadcast_to(x[0][c], (n, nr)),
                jnp.broadcast_to(x[1][c], (n, nr)),
            )

        z_cols = []
        pp_cols = []
        for c in range(nc):
            b = bview(betas, c)
            gma = bview(gammas, c)
            numer = gf.add(gf.add(wires, gf.mul(b, s_id)), gma)
            denom = gf.add(gf.add(wires, gf.mul(b, sigmas)), gma)
            flat_inv = gf.batch_inverse((denom[0].reshape(-1), denom[1].reshape(-1)))
            quot = gf.mul(numer, (flat_inv[0].reshape(n, nr), flat_inv[1].reshape(n, nr)))
            q = (quot[0].reshape(n, nr // chunk, chunk), quot[1].reshape(n, nr // chunk, chunk))
            cp = (q[0][:, :, 0], q[1][:, :, 0])
            for j in range(1, chunk):
                cp = gf.mul(cp, (q[0][:, :, j], q[1][:, :, j]))
            # inclusive prefix product along the chunk axis (log-doubling)
            cum = cp
            shift = 1
            while shift < nr // chunk:
                upd = gf.mul(
                    (cum[0][:, shift:], cum[1][:, shift:]),
                    (cum[0][:, :-shift], cum[1][:, :-shift]),
                )
                cum = (
                    jnp.concatenate([cum[0][:, :shift], upd[0]], axis=1),
                    jnp.concatenate([cum[1][:, :shift], upd[1]], axis=1),
                )
                shift <<= 1
            row_prod = (cum[0][:, -1], cum[1][:, -1])  # [n]
            # exclusive prefix product over rows -> Z values
            one = gf.ones((1,))
            z = (
                jnp.concatenate([one[0], row_prod[0][:-1]]),
                jnp.concatenate([one[1], row_prod[1][:-1]]),
            )
            shift = 1
            while shift < n:
                upd = gf.mul(
                    (z[0][shift:], z[1][shift:]), (z[0][:-shift], z[1][:-shift])
                )
                z = (
                    jnp.concatenate([z[0][:shift], upd[0]]),
                    jnp.concatenate([z[1][:shift], upd[1]]),
                )
                shift <<= 1
            pps = gf.mul(
                (z[0][:, None], z[1][:, None]),
                (cum[0][:, :num_prods], cum[1][:, :num_prods]),
            )  # [n, num_prods]
            z_cols.append(z)
            pp_cols.append(pps)
        # layout matches the host: all Z columns, then per-challenge pps
        lo = [zc[0][None, :] for zc in z_cols] + [
            pp_cols[i][0].T for i in range(nc)
        ]
        hi = [zc[1][None, :] for zc in z_cols] + [
            pp_cols[i][1].T for i in range(nc)
        ]
        return jnp.concatenate(lo, axis=0), jnp.concatenate(hi, axis=0)

    return partial_products_fn


def _zs_and_partial_products_device(wires_dev, betas, gammas, prover_data, common) -> gf.Gf:
    """wires_dev: [num_wires, n] limb pair; betas/gammas: [nc] limb pairs
    (traced or concrete). Returns [(1+num_prods)*nc, n] limb pair."""
    config = common.config
    nr = config.num_routed_wires
    n = common.degree
    chunk = common.permutation_partial_product_degree()
    num_prods = common.num_partial_products
    wires = (wires_dev[0][:nr].T, wires_dev[1][:nr].T)  # [n, nr]
    # witness-independent [n, nr] tables — memoized on the prover data
    # (recomputing s_id cost ~0.1 s of host numpy per prove)
    cached = getattr(prover_data, "_zs_tables", None)
    if cached is None:
        sigmas = gf.from_u64(np.ascontiguousarray(prover_data.sigmas))
        s_id = gf.from_u64(
            gl.np_mul(
                np.array(common.k_is, dtype=np.uint64)[None, :],
                prover_data.subgroup[:, None],
            )
        )
        cached = (sigmas, s_id)
        prover_data._zs_tables = cached
    sigmas, s_id = cached
    return _zs_device_fn(config.num_challenges, n, nr, chunk, num_prods)(
        wires, sigmas, s_id, betas, gammas
    )


def _zs_and_partial_products(witness, betas, gammas, prover_data, common) -> np.ndarray:
    config = common.config
    nr = config.num_routed_wires
    n = common.degree
    chunk = common.permutation_partial_product_degree()
    num_prods = common.num_partial_products
    subgroup = prover_data.subgroup  # [n]
    k_is = np.array(common.k_is, dtype=np.uint64)
    wires = witness.wire_values[:nr].T  # [n, nr]
    sigmas = prover_data.sigmas  # [n, nr]

    z_cols = []
    pp_cols = []
    for beta, gamma in zip(betas, gammas):
        b = np.uint64(beta)
        gma = np.uint64(gamma)
        s_id = gl.np_mul(k_is[None, :], subgroup[:, None])  # [n, nr]
        numer = gl.np_add(gl.np_add(wires, gl.np_mul(b, s_id)), gma)
        denom = gl.np_add(gl.np_add(wires, gl.np_mul(b, sigmas)), gma)
        quot = gl.np_mul(numer, gl.np_batch_inverse(denom))  # [n, nr]
        # chunk products [n, nr/chunk]
        q = quot.reshape(n, nr // chunk, chunk)
        cp = q[:, :, 0]
        for j in range(1, chunk):
            cp = gl.np_mul(cp, q[:, :, j])
        # inclusive prefix products along the chunk axis
        cum = cp.copy()
        shift = 1
        while shift < cum.shape[1]:
            cum[:, shift:] = gl.np_mul(cum[:, shift:], cum[:, :-shift])
            shift <<= 1
        row_prod = cum[:, -1]  # [n]
        # exclusive prefix product over rows -> Z values
        z = np.ones(n, dtype=np.uint64)
        z[1:] = row_prod[:-1]
        shift = 1
        while shift < n:
            z[shift:] = gl.np_mul(z[shift:], z[:-shift])
            shift <<= 1
        # partial products: z[i] * cum[i, k] for k < num_prods
        pps = gl.np_mul(z[:, None], cum[:, :num_prods])  # [n, num_prods]
        z_cols.append(z)
        pp_cols.append(pps)

    polys = z_cols + [pp_cols[i][:, k] for i in range(len(betas)) for k in range(num_prods)]
    return np.stack(polys)  # [(1+num_prods)*nc, n]


# ---------------------------------------------------------------------------
# Quotient computation
# ---------------------------------------------------------------------------


from functools import lru_cache

from ..parallel import context as pctx


@lru_cache(maxsize=None)
def _natural_order_fn(mesh_key, step: int = 1):
    cols = pctx.cols_sharding(mesh_key)

    @jax.jit
    def natural_order_leaves(leaves):
        if step != 1:
            # strided sub-LDE: natural points shift*w^(i*step) form the
            # lower-rate coset the quotient kernel consumes when
            # rate_bits > quotient_degree_bits (the reference's
            # get_lde_values(index, step), fri/oracle.rs:286-292) —
            # gathering every step-th natural row skips the rest entirely
            perm = reverse_index_bits_perm(leaves[0].shape[0])[::step]
            lo = jnp.take(leaves[0], perm, axis=0).T
            hi = jnp.take(leaves[1], perm, axis=0).T
        else:
            from ..ops.bitrev import bitrev_axis

            lo = bitrev_axis(leaves[0], axis=0).T
            hi = bitrev_axis(leaves[1], axis=0).T
        # point-axis sharding: quotient constraint eval is pointwise
        # (prover.rs:720's par_chunks over LDE points)
        return pctx.constrain((lo, hi), cols)

    return natural_order_leaves


def _natural_order_jit(leaves, step: int = 1):
    return _natural_order_fn(pctx.mesh_key(), step)(leaves)


@lru_cache(maxsize=None)
def _quotient_chunks_fn(mesh_key, num_chunks: int, n: int):
    polys = pctx.polys_sharding(mesh_key)

    if mesh_key is not None:
        # domain-sharded six-step coset-IFFT: butterflies stay local to
        # each shard, only the three transposes cross chips — per-chip
        # memory is N/d instead of the replicated N the naive path needs
        # (SURVEY §5.7; reference single-node dual: field/src/fft.rs)
        from ..parallel.ntt import coset_ifft_tables, six_step_coset_ifft_batch

        mesh, axis = mesh_key
        cols = pctx.cols_sharding(mesh_key)
        tw_sharding = pctx.polys_sharding(mesh_key)  # [N1, N2] rows n1

        @jax.jit
        def quotient_coset_ifft_mesh(q, tables):
            q = pctx.constrain(q, cols)
            coeffs = six_step_coset_ifft_batch(q, tables, mesh, axis)
            chunks = (
                coeffs[0].reshape(num_chunks, n),
                coeffs[1].reshape(num_chunks, n),
            )
            return pctx.constrain(chunks, polys)

        def call(q):
            n_log = log2_strict(q[0].shape[-1])
            tabs = coset_ifft_tables(n_log, gl.MULTIPLICATIVE_GROUP_GENERATOR)
            tw = pctx.put((jnp.asarray(tabs[0]), jnp.asarray(tabs[1])), tw_sharding)
            small = [jnp.asarray(t) for t in tabs[2:]]
            return quotient_coset_ifft_mesh(q, (tw[0], tw[1], *small))

        return call

    @jax.jit
    def quotient_coset_ifft(q):
        coeffs = ntt.coset_ifft(q)
        chunks = (coeffs[0].reshape(num_chunks, n), coeffs[1].reshape(num_chunks, n))
        return pctx.constrain(chunks, polys)

    return quotient_coset_ifft


def _natural_order_values(batch: fo.PolynomialBatch, step: int = 1) -> gf.Gf:
    """Leaves are bit-reversed point-major [lde_n, M]; return poly-major
    natural order [M, lde_n // step], stripping any zk salt columns.
    step > 1 samples the committed high-rate LDE down to the lower-rate
    coset (fri/oracle.rs:286-292 get_lde_values with step)."""
    nat = _natural_order_jit(batch.merkle_tree.leaves, step)
    if batch.salt_size:
        nat = (nat[0][: -batch.salt_size], nat[1][: -batch.salt_size])
    return nat


@lru_cache(maxsize=None)
def _quotient_coset_constants(n_bits: int, qdb: int):
    """(shifted_xs, zh_inv, l0) numpy u64 arrays over the quotient coset.

    Z_H(shift*w^i) = shift^n * (w^i)^n - 1, periodic with period 2^qdb.
    NOTE subtlety: evals indexed by i use subgroup(qdb) in *power* order
    of w^(n*i) = v^i where v = primitive 2^qdb-th root; i % 2^qdb cycles.
    """
    n = 1 << n_bits
    q_lde_n = n << qdb
    pts = gl.two_adic_subgroup(n_bits + qdb)  # [q_lde_n]
    shift = np.uint64(gl.MULTIPLICATIVE_GROUP_GENERATOR)
    shifted_xs = gl.np_mul(shift, pts)
    g_pow_n = gl.gexp(gl.MULTIPLICATIVE_GROUP_GENERATOR, n)
    zh_period = gl.np_sub(
        gl.np_mul(np.uint64(g_pow_n), gl.two_adic_subgroup(qdb)), np.uint64(1)
    )
    zh = np.tile(zh_period, q_lde_n // (1 << qdb))
    zh_inv = gl.np_batch_inverse(zh)
    l0 = gl.np_mul(
        zh,
        gl.np_batch_inverse(
            gl.np_mul(np.uint64(n % gl.P), gl.np_sub(shifted_xs, np.uint64(1)))
        ),
    )
    return shifted_xs, zh_inv, l0


def _compute_quotient_polys(
    common,
    prover_data,
    public_inputs_hash,
    wires_commitment,
    zs_pp_commitment,
    betas,
    gammas,
    alphas,
    deltas=(),
    device_challenges=False,
):
    """device_challenges: betas/gammas/alphas are already [nc] device limb
    pairs (possibly traced) — the device-transcript prover's path."""
    config = common.config
    qdb = common.quotient_degree_factor.bit_length() - 1
    assert (1 << qdb) == common.quotient_degree_factor
    assert qdb <= config.fri_config.rate_bits
    # rate_bits > qdb: the committed LDE is higher-rate than the quotient
    # needs — sample it at a stride instead of recomputing
    step = 1 << (config.fri_config.rate_bits - qdb)
    n_bits = common.degree_bits
    q_lde_n = common.degree << qdb  # quotient-domain size (<= lde_size)
    n = common.degree

    # host precomputations over the coset — witness-independent, so
    # cached per (degree, qdb): the two 2^16-element batch inverses cost
    # ~0.4 s of interpreted numpy PER PROVE otherwise (measured 55% of
    # the warm device-transcript outer prove)
    shifted_xs, zh_inv, l0 = _quotient_coset_constants(n_bits, qdb)

    cs_nat = _natural_order_values(prover_data.constants_sigmas_commitment, step)
    wires_nat = _natural_order_values(wires_commitment, step)
    zs_pp_nat = _natural_order_values(zs_pp_commitment, step)

    def pair_arr(vals: List[int]):
        a = np.array(vals, dtype=np.uint64)
        return gf.from_u64(a)

    qfn = quotient_values_fn(common)
    deltas_arr = None
    lut_evals_arr = None
    if common.num_lookup_polys:
        if device_challenges:
            # deltas already a [NUM_COINS_LOOKUP * nc] device limb pair
            deltas_arr = deltas
            lut_evals_arr = _lut_evals_device(deltas, common)
        else:
            deltas_arr = pair_arr(list(deltas))
            num_lut_slots = config.num_routed_wires // 3
            ev = np.zeros((config.num_challenges, len(common.luts)), dtype=np.uint64)
            for i in range(config.num_challenges):
                d4 = deltas[NUM_COINS_LOOKUP * i : NUM_COINS_LOOKUP * (i + 1)]
                for li in range(len(common.luts)):
                    rows_cnt = -(-len(common.luts[li]) // num_lut_slots)
                    ev[i, li] = get_lut_poly_eval(
                        common, li, d4[1], d4[3], num_lut_slots * rows_cnt
                    )
            lut_evals_arr = gf.from_u64(ev)
    pts_sharding = pctx.rows_sharding(pctx.mesh_key())
    if device_challenges:
        betas_a, gammas_a, alphas_a = betas, gammas, alphas
    else:
        betas_a, gammas_a, alphas_a = (
            pair_arr(betas), pair_arr(gammas), pair_arr(alphas)
        )
    q_lo, q_hi = qfn(
        cs_nat,
        wires_nat,
        zs_pp_nat,
        pctx.put(gf.from_u64(shifted_xs), pts_sharding),
        pctx.put(gf.from_u64(l0), pts_sharding),
        pctx.put(gf.from_u64(zh_inv), pts_sharding),
        betas_a,
        gammas_a,
        alphas_a,
        pair_arr(list(public_inputs_hash)),
        deltas=deltas_arr,
        lut_evals=lut_evals_arr,
    )
    # coset-IFFT back to coefficients, split into degree-n chunks
    nc = config.num_challenges
    return _quotient_chunks_fn(
        pctx.mesh_key(), nc * common.quotient_degree_factor, n
    )((q_lo, q_hi))


# ---------------------------------------------------------------------------
# Lookups (prover.rs:42-140 set_lookup_wires; :489-637 compute_lookup_polys)
# ---------------------------------------------------------------------------


def set_lookup_wires(prover_data, common, pw) -> None:
    """Computes multiplicities, pads the last LookupGate and fills the
    LookupTableGate multiplicity wires.

    Vectorized (reference: plonk/prover.rs:42-140 loops per lookup under
    rayon): the multiplicity histogram is one bincount over the gathered
    lookup-input values via a 2^16 inverse table, and the multiplicity
    wires are one bulk set — the only per-item Python is extracting each
    lookup target's dense index."""
    from ..gates.lookup import LookupGate, LookupTableGate
    from ..iop.target import Target

    config = common.config
    num_entries = config.num_routed_wires // 2
    num_lut_entries = config.num_routed_wires // 3
    nw, deg = pw.num_wires, pw.degree
    for lut_index, (last_lu, last_lut, first_lut) in enumerate(prover_data.lookup_rows):
        lut = common.luts[lut_index]
        lut_inputs = np.fromiter((inp for inp, _ in lut), np.int64, count=len(lut))
        # first occurrence wins (reference setdefault semantics)
        inv = np.full(1 << 16, -1, np.int64)
        inv[lut_inputs[::-1]] = np.arange(len(lut) - 1, -1, -1)
        lookups = prover_data.lut_to_lookups[lut_index]
        flat = np.fromiter(
            (t.flat_index(nw, deg) for t, _ in lookups), np.int64, count=len(lookups)
        )
        v = pw.get_wires_bulk(flat)
        assert (v < (1 << 16)).all(), "lookup input exceeds u16"
        idx = inv[v.astype(np.int64)]
        assert (idx >= 0).all(), "lookup input not present in the LUT"
        multiplicities = np.bincount(idx, minlength=len(lut)).astype(object)
        remaining = (num_entries - (len(lookups) % num_entries)) % num_entries
        fi, fo = lut[0]
        for slot in range(num_entries - remaining, num_entries):
            pw.set_target(
                Target.wire(last_lut - 1, LookupGate.wire_ith_looking_inp(slot)), fi
            )
            pw.set_target(
                Target.wire(last_lut - 1, LookupGate.wire_ith_looking_out(slot)), fo
            )
            multiplicities[0] += 1
        entries = np.arange(len(lut))
        pw.set_wires_bulk(
            first_lut - entries // num_lut_entries,
            np.fromiter(
                (LookupTableGate.wire_ith_multiplicity(c) for c in entries % num_lut_entries),
                np.int64,
                count=len(lut),
            ),
            multiplicities,
        )


_LOOKUP_DEV_CACHE = {}


def _lookup_polys_device(wires_dev: gf.Gf, deltas: gf.Gf, prover_data, common) -> gf.Gf:
    """Device dual of compute_all_lookup_polys with TRACED/device deltas —
    the device-transcript prover's path (prover.rs:489-637). wires_dev:
    [num_wires, n] limb pair; deltas: [NUM_COINS_LOOKUP * nc] limb pair.
    Returns [nc * num_lookup_polys, n] limb pair, row layout identical to
    the host version (per challenge: RE, then the partial-SLDC columns)."""
    key = (tuple(prover_data.circuit_digest), "lookup_polys")
    fn = _LOOKUP_DEV_CACHE.get(key)
    if fn is None:
        fn = _make_lookup_polys_device_fn(prover_data, common)
        _LOOKUP_DEV_CACHE[key] = fn
    return fn(wires_dev, deltas)


def _dev_suffix_sum(x: gf.Gf) -> gf.Gf:
    """out[i] = sum_{j >= i} x[j] mod p by log-doubling (device dual of
    _suffix_sum_mod)."""
    n = x[0].shape[0]
    shift = 1
    while shift < n:
        upd = gf.add((x[0][:-shift], x[1][:-shift]), (x[0][shift:], x[1][shift:]))
        x = (
            jnp.concatenate([upd[0], x[0][-shift:]]),
            jnp.concatenate([upd[1], x[1][-shift:]]),
        )
        shift <<= 1
    return x


def _make_lookup_polys_device_fn(prover_data, common):
    from ..gates.lookup import LookupGate, LookupTableGate

    config = common.config
    degree = common.degree
    nc = config.num_challenges
    num_lu_slots = config.num_routed_wires // 2
    lu_degree = common.lookup_accumulator_degree()
    num_partial = -(-num_lu_slots // lu_degree)
    num_lut_slots = config.num_routed_wires // 3
    lut_degree = -(-num_lut_slots // num_partial)

    blocks = [
        (np.arange(last_lut, first_lut + 1), np.arange(last_lu, last_lut))
        for (last_lu, last_lut, first_lut) in prover_data.lookup_rows
    ]
    inp_cols = np.array(
        [LookupTableGate.wire_ith_looked_inp(s) for s in range(num_lut_slots)]
    )
    out_cols = np.array(
        [LookupTableGate.wire_ith_looked_out(s) for s in range(num_lut_slots)]
    )
    mult_cols = np.array(
        [LookupTableGate.wire_ith_multiplicity(s) for s in range(num_lut_slots)]
    )
    li_cols = np.array(
        [LookupGate.wire_ith_looking_inp(s) for s in range(num_lu_slots)]
    )
    lo_cols = np.array(
        [LookupGate.wire_ith_looking_out(s) for s in range(num_lu_slots)]
    )

    def bc(s, shape):
        return (jnp.broadcast_to(s[0], shape), jnp.broadcast_to(s[1], shape))

    def inv2d(x: gf.Gf) -> gf.Gf:
        shape = x[0].shape
        flat = gf.batch_inverse((x[0].reshape(-1), x[1].reshape(-1)))
        return flat[0].reshape(shape), flat[1].reshape(shape)

    def chunked_prefix(terms: gf.Gf, rows: int, slots: int, deg: int):
        """Per row: within-chunk sums of `terms` [rows, slots] chunked by
        `deg`, then the running prefix over chunks. Returns ([rows,
        num_partial] prefix pair, [rows] row-total pair)."""
        sums_lo, sums_hi = [], []
        for k in range(num_partial):
            lo_i, hi_i = k * deg, min((k + 1) * deg, slots)
            s = (terms[0][:, lo_i:hi_i], terms[1][:, lo_i:hi_i])
            sums = gf.sum_mod_p(s, axis=1)
            sums_lo.append(sums[0])
            sums_hi.append(sums[1])
        pref_lo, pref_hi = [sums_lo[0]], [sums_hi[0]]
        for k in range(1, num_partial):
            nxt = gf.add((pref_lo[-1], pref_hi[-1]), (sums_lo[k], sums_hi[k]))
            pref_lo.append(nxt[0])
            pref_hi.append(nxt[1])
        prefix = (jnp.stack(pref_lo, axis=1), jnp.stack(pref_hi, axis=1))
        return prefix, (pref_lo[-1], pref_hi[-1])

    @jax.jit
    def lookup_polys_fn(wires, deltas):
        out_lo, out_hi = [], []
        for c in range(nc):
            def dd(k):
                i = NUM_COINS_LOOKUP * c + k
                return (deltas[0][i], deltas[1][i])

            dA, dB, dAlpha, dDelta = dd(0), dd(1), dd(2), dd(3)
            polys_lo = jnp.zeros((num_partial + 1, degree), dtype=gf.U32)
            polys_hi = jnp.zeros((num_partial + 1, degree), dtype=gf.U32)
            for (lut_rows, lu_rows) in blocks:
                L, M = lut_rows.shape[0], lu_rows.shape[0]

                def sub(cols, rows):
                    return (
                        wires[0][cols][:, rows].T,
                        wires[1][cols][:, rows].T,
                    )

                inp = sub(inp_cols, lut_rows)  # [L, S]
                outv = sub(out_cols, lut_rows)
                mult = sub(mult_cols, lut_rows)
                shape = inp[0].shape
                looked = gf.add(inp, gf.mul(bc(dA, shape), outv))
                inv = inv2d(gf.sub(bc(dAlpha, shape), looked))
                combos = gf.add(inp, gf.mul(bc(dB, shape), outv))

                # RE[r] = a_r + c_f * RE[r+1], c_f = delta^S,
                # a_r = sum_j combos[r, j] * delta^(S-1-j): the affine
                # suffix scan as c^-i * suffix_sum(a_i * c^i)
                dpow = gf.powers_scan(dDelta, num_lut_slots + 1)  # [S+1]
                w = (
                    dpow[0][num_lut_slots - 1 :: -1],
                    dpow[1][num_lut_slots - 1 :: -1],
                )  # delta^(S-1-j) for j = 0..S-1
                a = gf.sum_mod_p(gf.mul(combos, bc(w, shape)), axis=1)  # [L]
                c_f = (dpow[0][num_lut_slots], dpow[1][num_lut_slots])
                c_inv_arr = gf.batch_inverse(
                    (c_f[0].reshape(1), c_f[1].reshape(1))
                )
                c_inv = (c_inv_arr[0][0], c_inv_arr[1][0])
                c_pows = gf.powers_scan(c_f, L)
                cinv_pows = gf.powers_scan(c_inv, L)
                re = gf.mul(cinv_pows, _dev_suffix_sum(gf.mul(a, c_pows)))
                polys_lo = polys_lo.at[0, lut_rows].set(re[0])
                polys_hi = polys_hi.at[0, lut_rows].set(re[1])

                terms = gf.mul(mult, inv)  # [L, S]
                lut_prefix, lut_row_total = chunked_prefix(
                    terms, L, num_lut_slots, lut_degree
                )

                if M:
                    linp = sub(li_cols, lu_rows)  # [M, S2]
                    lout = sub(lo_cols, lu_rows)
                    lshape = linp[0].shape
                    looking = gf.add(linp, gf.mul(bc(dA, lshape), lout))
                    linv = inv2d(gf.sub(bc(dAlpha, lshape), looking))
                    lu_prefix, lu_row_total = chunked_prefix(
                        linv, M, num_lu_slots, lu_degree
                    )
                else:
                    z = jnp.zeros((0, num_partial), dtype=gf.U32)
                    lu_prefix = (z, z)
                    z1 = jnp.zeros((0,), dtype=gf.U32)
                    lu_row_total = (z1, z1)

                # block-local suffix sum: +lut totals, -lu totals
                zero = gf.zeros((M,))
                neg_lu = gf.sub(zero, lu_row_total)
                delta_m = (
                    jnp.concatenate([neg_lu[0], lut_row_total[0]]),
                    jnp.concatenate([neg_lu[1], lut_row_total[1]]),
                )
                carry = _dev_suffix_sum(delta_m)
                z1 = jnp.zeros((1,), dtype=gf.U32)
                carry_next = (
                    jnp.concatenate([carry[0][1:], z1]),
                    jnp.concatenate([carry[1][1:], z1]),
                )
                for k in range(num_partial):
                    if M:
                        vlo, vhi = gf.sub(
                            (carry_next[0][:M], carry_next[1][:M]),
                            (lu_prefix[0][:, k], lu_prefix[1][:, k]),
                        )
                        polys_lo = polys_lo.at[k + 1, lu_rows].set(vlo)
                        polys_hi = polys_hi.at[k + 1, lu_rows].set(vhi)
                    vlo, vhi = gf.add(
                        (carry_next[0][M:], carry_next[1][M:]),
                        (lut_prefix[0][:, k], lut_prefix[1][:, k]),
                    )
                    polys_lo = polys_lo.at[k + 1, lut_rows].set(vlo)
                    polys_hi = polys_hi.at[k + 1, lut_rows].set(vhi)
            out_lo.append(polys_lo)
            out_hi.append(polys_hi)
        return jnp.concatenate(out_lo, axis=0), jnp.concatenate(out_hi, axis=0)

    return lookup_polys_fn


def _lut_evals_device(deltas: gf.Gf, common) -> gf.Gf:
    """Device dual of the get_lut_poly_eval loop: [nc, num_luts] limb pair
    with traced dB/dDelta (vanishing_poly.rs:30-52; Horner replaced by a
    weighted sum with scan-computed delta powers — identical mod p)."""
    config = common.config
    nc = config.num_challenges
    num_lut_slots = config.num_routed_wires // 3
    evals_lo, evals_hi = [], []
    for i in range(nc):
        dB = (deltas[0][NUM_COINS_LOOKUP * i + 1], deltas[1][NUM_COINS_LOOKUP * i + 1])
        dDelta = (
            deltas[0][NUM_COINS_LOOKUP * i + 3],
            deltas[1][NUM_COINS_LOOKUP * i + 3],
        )
        row_lo, row_hi = [], []
        for li in range(len(common.luts)):
            lut = common.luts[li]
            n = len(lut)
            rows_cnt = -(-n // num_lut_slots)
            deg = num_lut_slots * rows_cnt
            nb_padded = (num_lut_slots - n % num_lut_slots) % num_lut_slots
            inp = np.array(
                [i0 for i0, _ in lut] + [lut[0][0]] * nb_padded + [0] * (deg - n - nb_padded),
                dtype=np.uint64,
            )
            out = np.array(
                [o0 for _, o0 in lut] + [lut[0][1]] * nb_padded + [0] * (deg - n - nb_padded),
                dtype=np.uint64,
            )
            ig = gf.from_u64(inp)
            og = gf.from_u64(out)
            coeffs = gf.add(ig, gf.mul((jnp.broadcast_to(dB[0], og[0].shape), jnp.broadcast_to(dB[1], og[1].shape)), og))
            dpows = gf.powers_scan(dDelta, deg)  # delta^0..delta^(deg-1)
            # Horner over the pushed order: coeff j gets delta^(deg-1-j)
            wrev = (dpows[0][::-1], dpows[1][::-1])
            ev = gf.sum_mod_p(gf.mul(coeffs, wrev), axis=0)
            row_lo.append(ev[0])
            row_hi.append(ev[1])
        evals_lo.append(jnp.stack(row_lo))
        evals_hi.append(jnp.stack(row_hi))
    return jnp.stack(evals_lo), jnp.stack(evals_hi)


def compute_all_lookup_polys(witness, deltas, prover_data, common) -> np.ndarray:
    """RE + partial-SLDC polynomials for every challenge set; returns
    [nc * num_lookup_polys, degree] u64."""
    out = []
    for c in range(common.config.num_challenges):
        out.extend(
            _compute_lookup_polys(
                witness,
                deltas[c * NUM_COINS_LOOKUP : (c + 1) * NUM_COINS_LOOKUP],
                prover_data,
                common,
            )
        )
    return np.array(out, dtype=np.uint64)


def _suffix_sum_mod(a: np.ndarray) -> np.ndarray:
    """out[i] = sum_{j >= i} a[j] mod p, by log-doubling (no Python rows)."""
    out = a.copy()
    shift = 1
    n = out.shape[0]
    while shift < n:
        out[:-shift] = gl.np_add(out[:-shift], out[shift:])
        shift <<= 1
    return out


def _compute_lookup_polys(witness, deltas4, prover_data, common):
    """RE + partial-SLDC columns, fully vectorized: per block, slot
    combinations / batched inverses are numpy matrix ops and the
    row-sequential recurrences (RE's affine chain, the running partial
    sum) become log-depth suffix scans — the reference's per-row rayon
    loop (prover.rs:489-637) without O(n) interpreter work."""
    from ..gates.lookup import LookupGate, LookupTableGate

    degree = common.degree
    config = common.config
    num_lu_slots = config.num_routed_wires // 2
    lu_degree = common.lookup_accumulator_degree()
    num_partial = -(-num_lu_slots // lu_degree)
    num_lut_slots = config.num_routed_wires // 3
    lut_degree = -(-num_lut_slots // num_partial)
    dA, dB, dAlpha, dDelta = (np.uint64(d) for d in deltas4)

    polys = np.zeros((num_partial + 1, degree), dtype=np.uint64)
    wires = witness.wire_values  # [num_wires, n] u64

    for (last_lu, last_lut, first_lut) in prover_data.lookup_rows:
        # --- LUT rows [last_lut, first_lut] ---
        lut_rows = np.arange(last_lut, first_lut + 1)
        L = lut_rows.shape[0]
        inp_cols = [LookupTableGate.wire_ith_looked_inp(s) for s in range(num_lut_slots)]
        out_cols = [LookupTableGate.wire_ith_looked_out(s) for s in range(num_lut_slots)]
        mult_cols = [LookupTableGate.wire_ith_multiplicity(s) for s in range(num_lut_slots)]
        inp = wires[inp_cols][:, lut_rows].T  # [L, S]
        out = wires[out_cols][:, lut_rows].T
        mult = wires[mult_cols][:, lut_rows].T
        looked = gl.np_add(inp, gl.np_mul(dA, out))
        inv = gl.np_batch_inverse(gl.np_sub(dAlpha, looked))
        combos = gl.np_add(inp, gl.np_mul(dB, out))

        # RE[r] = a_r + c * RE[r+1] with c = delta^S and
        # a_r = sum_j combos[r, j] * delta^(S-1-j): affine suffix scan
        # realized as c^-i * suffix_sum(a_i * c^i)
        dpow = gl.np_powers(int(dDelta), num_lut_slots + 1)  # delta^0..delta^S
        a = np.zeros(L, dtype=np.uint64)
        for j in range(num_lut_slots):
            a = gl.np_add(a, gl.np_mul(combos[:, j], dpow[num_lut_slots - 1 - j]))
        c = int(dpow[num_lut_slots])
        c_pows = gl.np_powers(c, L)
        cinv_pows = gl.np_powers(gl.ginv(c), L)
        re = gl.np_mul(cinv_pows, _suffix_sum_mod(gl.np_mul(a, c_pows)))
        polys[0][lut_rows] = re

        # row totals and within-row chunk prefix sums of mult * inv
        terms = gl.np_mul(mult, inv)  # [L, S]
        chunk_sums = np.zeros((L, num_partial), dtype=np.uint64)
        for k in range(num_partial):
            lo, hi = k * lut_degree, min((k + 1) * lut_degree, num_lut_slots)
            s = np.zeros(L, dtype=np.uint64)
            for j in range(lo, hi):
                s = gl.np_add(s, terms[:, j])
            chunk_sums[:, k] = s
        lut_prefix = chunk_sums.copy()
        for k in range(1, num_partial):
            lut_prefix[:, k] = gl.np_add(lut_prefix[:, k], lut_prefix[:, k - 1])
        lut_row_total = lut_prefix[:, -1]

        # --- LU rows [last_lu, last_lut-1] ---
        lu_rows = np.arange(last_lu, last_lut)
        M = lu_rows.shape[0]
        if M:
            li_cols = [LookupGate.wire_ith_looking_inp(s) for s in range(num_lu_slots)]
            lo_cols = [LookupGate.wire_ith_looking_out(s) for s in range(num_lu_slots)]
            linp = wires[li_cols][:, lu_rows].T
            lout = wires[lo_cols][:, lu_rows].T
            looking = gl.np_add(linp, gl.np_mul(dA, lout))
            linv = gl.np_batch_inverse(gl.np_sub(dAlpha, looking))
            lu_chunks = np.zeros((M, num_partial), dtype=np.uint64)
            for k in range(num_partial):
                lo, hi = k * lu_degree, min((k + 1) * lu_degree, num_lu_slots)
                s = np.zeros(M, dtype=np.uint64)
                for j in range(lo, hi):
                    s = gl.np_add(s, linv[:, j])
                lu_chunks[:, k] = s
            lu_prefix = lu_chunks.copy()
            for k in range(1, num_partial):
                lu_prefix[:, k] = gl.np_add(lu_prefix[:, k], lu_prefix[:, k - 1])
            lu_row_total = lu_prefix[:, -1]
        else:
            lu_prefix = np.zeros((0, num_partial), dtype=np.uint64)
            lu_row_total = np.zeros(0, dtype=np.uint64)

        # carry[r] = polys[num_partial][r]: suffix sum over the whole block
        # of +lut_row_total (lut rows) / -lu_row_total (lu rows)
        block_rows = np.arange(last_lu, first_lut + 1)
        delta_m = np.concatenate([gl.np_sub(np.uint64(0), lu_row_total), lut_row_total])
        carry = _suffix_sum_mod(delta_m)  # indexed by block-local row
        carry_next = np.zeros_like(carry)
        carry_next[:-1] = carry[1:]  # carry[r+1]; top row's next is 0

        # partials: polys[k][r] = carry[r+1] +/- chunk prefix sums
        for k in range(num_partial):
            if M:
                polys[k + 1][lu_rows] = gl.np_sub(carry_next[:M], lu_prefix[:, k])
            polys[k + 1][lut_rows] = gl.np_add(carry_next[M:], lut_prefix[:, k])

    return [polys[i] for i in range(num_partial + 1)]
