import jax
import jax.numpy as jnp
import numpy as np

from panopticdiffusionmodels_tpu.diffusion.analog_bits import (
    analog_to_ints,
    bits2int,
    int2bits,
    ints_to_analog,
)


def test_roundtrip_all_values():
    x = jnp.arange(256, dtype=jnp.int32).reshape(1, 16, 16, 1)
    bits = int2bits(x, n=8)
    assert bits.shape == (1, 16, 16, 8)
    back = bits2int(bits, n=8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_msb_first_layout():
    # 128 = 0b10000000 -> MSB channel first.
    x = jnp.full((1, 1, 1, 1), 128, dtype=jnp.int32)
    bits = np.asarray(int2bits(x, n=8))[0, 0, 0]
    np.testing.assert_array_equal(bits, [1, 0, 0, 0, 0, 0, 0, 0])
    x = jnp.full((1, 1, 1, 1), 1, dtype=jnp.int32)
    bits = np.asarray(int2bits(x, n=8))[0, 0, 0]
    np.testing.assert_array_equal(bits, [0, 0, 0, 0, 0, 0, 0, 1])


def test_multi_channel():
    x = jnp.array([[[[3, 200]]]], dtype=jnp.int32)  # (1,1,1,2)
    bits = int2bits(x, n=8)
    assert bits.shape == (1, 1, 1, 16)
    back = bits2int(bits, n=8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_analog_roundtrip_with_noise():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (2, 8, 8, 1), 0, 201)
    analog = ints_to_analog(x)
    assert analog.min() >= -1.0 and analog.max() <= 1.0
    # Small perturbations below the decision boundary don't flip bits.
    noisy = analog + 0.4 * jax.random.normal(key, analog.shape)
    noisy = jnp.clip(noisy, -1.9, 1.9)
    # Exact recovery on the clean signal:
    np.testing.assert_array_equal(np.asarray(analog_to_ints(analog)), np.asarray(x))


def test_matches_reference_semantics():
    # Reference decodes with weight 2**(n-1-i) on channel i (utils.py:499).
    x = jnp.full((1, 1, 1, 1), 0b10110101, dtype=jnp.int32)
    bits = np.asarray(int2bits(x, n=8))[0, 0, 0]
    val = sum(int(bits[i]) * 2 ** (8 - 1 - i) for i in range(8))
    assert val == 0b10110101
