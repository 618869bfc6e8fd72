"""Per-component timing of one trunk block at L=1000 (bf16) on the real chip.

Each op is scan-chained N times inside one jit with a single readback, so the
tunnel round-trip (~25 ms) amortizes away. Multiply block time by 48.
Run: PALLAS_AXON_REMOTE_COMPILE=1 python -u scripts_dev/trunk_ablate_tpu.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from esm_tpu.models.esmfold.init import _KeyGen, init_trunk_block
from esm_tpu.models.esmfold.blocks import (
    gated_attention, pair_to_sequence, residue_mlp, sequence_to_pair,
    triangular_self_attention_block,
)
from esm_tpu.ops.triangle import (
    triangle_attention,
    triangle_multiplicative_update,
    triangle_multiplicative_update_fused,
)
from esm_tpu.ops.common import layer_norm, linear

print("devices:", jax.devices(), flush=True)

L, c_s, c_z = 1000, 1024, 128
N = 10
dt = jnp.bfloat16
kg = _KeyGen(jax.random.PRNGKey(0))
params = init_trunk_block(kg, c_s, c_z)
key = jax.random.PRNGKey(1)
s0 = jax.random.normal(key, (1, L, c_s), dt)
z0 = jax.random.normal(key, (1, L, L, c_z), dt) * 0.1
mask = jnp.ones((1, L), dt)
tri_mask = (mask[:, :, None] * mask[:, None, :]).astype(z0.dtype)

def bench(name, fn, zlike=True, tflop=None):
    """fn: z->z (or s->s). Scan-chain N applications, one readback."""
    x0 = z0 if zlike else s0

    @jax.jit
    def chain(x):
        def body(x, _):
            y = fn(x)
            # keep shapes closed: damp to avoid overflow across 10 chained apps
            return (x * 0.5 + y.astype(x.dtype) * 0.5), None
        x, _ = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(x.astype(jnp.float32))

    float(chain(x0))  # compile+warm
    t0 = time.perf_counter()
    float(chain(x0))
    sec = (time.perf_counter() - t0) / N
    extra = f"  {tflop / sec:.1f} TF/s" if tflop else ""
    print(f"{name:34s} {sec * 1e3:8.2f} ms{extra}", flush=True)
    return sec

L3, L2 = L**3, L**2

total = 0.0
total += bench("pair_to_seq+seqattn+mlp+seq2pair",
    lambda z: z + sequence_to_pair(params["sequence_to_pair"], residue_mlp(
        params["mlp_seq"], s0 + gated_attention(
            params["seq_attention"], layer_norm(params["layernorm_1"], s0),
            num_heads=c_s // 32, mask=mask,
            bias=pair_to_sequence(params["pair_to_sequence"], z)))))
tm_flop = (2 * L3 * c_z + 6 * 2 * L2 * c_z * c_z) / 1e12
t_out = bench("tri_mul full (outgoing)",
    lambda z: triangle_multiplicative_update(params["tri_mul_out"], z, outgoing=True, mask=tri_mask),
    tflop=tm_flop)
t_in = bench("tri_mul full (incoming)",
    lambda z: triangle_multiplicative_update(params["tri_mul_in"], z, outgoing=False, mask=tri_mask),
    tflop=tm_flop)
total += t_out + t_in
bench("tri_mul FUSED (outgoing)",
    lambda z: triangle_multiplicative_update_fused(params["tri_mul_out"], z, outgoing=True, mask=tri_mask),
    tflop=tm_flop)
bench("tri_mul FUSED (incoming)",
    lambda z: triangle_multiplicative_update_fused(params["tri_mul_in"], z, outgoing=False, mask=tri_mask),
    tflop=tm_flop)
bench("tri_mul einsum only (out)",
    lambda z: jnp.einsum("bikc,bjkc->bijc", z, z), tflop=2 * L3 * c_z / 1e12)
bench("tri_mul einsum only (in)",
    lambda z: jnp.einsum("bkic,bkjc->bijc", z, z), tflop=2 * L3 * c_z / 1e12)
ta_flop = (4 * L3 * c_z + 5 * 2 * L2 * c_z * c_z) / 1e12
total += bench("tri_att start (fused pallas)",
    lambda z: triangle_attention(params["tri_att_start"], z, num_heads=4, starting=True,
                                 mask=tri_mask, use_flash=True), tflop=ta_flop)
total += bench("tri_att end (fused pallas)",
    lambda z: triangle_attention(params["tri_att_end"], z, num_heads=4, starting=False,
                                 mask=tri_mask, use_flash=True), tflop=ta_flop)
total += bench("mlp_pair", lambda z: residue_mlp(params["mlp_pair"], z),
    tflop=2 * 2 * L2 * c_z * 4 * c_z / 1e12)
bench("LN(z) alone", lambda z: layer_norm(params["mlp_pair"]["norm"], z))
bench("z transpose (swapaxes 1,2)", lambda z: jnp.swapaxes(z, 1, 2).copy())

def full_block(z):
    s, zz = triangular_self_attention_block(
        params, s0, z, seq_heads=c_s // 32, pair_heads=4, mask=mask, use_flash_tri=True)
    return zz
blk = bench("FULL BLOCK (fused tri)", full_block)
print(f"\nsum of parts ~= {total*1e3:.1f} ms; full block {blk*1e3:.1f} ms; x48 = {blk*48:.2f} s", flush=True)
