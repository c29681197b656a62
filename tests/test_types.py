import numpy as np
import jax.numpy as jnp

from modular_slam_tpu.types import pack_bits, unpack_bits, bits_to_pm1


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(17, 256)).astype(np.uint8)
    packed = pack_bits(jnp.asarray(bits))
    assert packed.shape == (17, 8)
    assert packed.dtype == jnp.uint32
    out = unpack_bits(packed)
    np.testing.assert_array_equal(np.array(out), bits)


def test_hamming_as_matmul():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2, size=(5, 256)).astype(np.uint8)
    b = rng.integers(0, 2, size=(7, 256)).astype(np.uint8)
    ham_ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    pa, pb = bits_to_pm1(jnp.asarray(a)), bits_to_pm1(jnp.asarray(b))
    dot = jnp.einsum("ik,jk->ij", pa.astype(jnp.int32), pb.astype(jnp.int32))
    ham = (256 - dot) // 2
    np.testing.assert_array_equal(np.array(ham), ham_ref)
