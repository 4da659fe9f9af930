"""Bit-tree Pallas codec (rc-p): interpret-mode kernel round-trip, XLA
twin parity, and the nibble-grouping ratio cost vs sequential rc-o0."""
import os
import subprocess
import sys

import numpy as np

_SCRIPT = r"""
import numpy as np
import jax.numpy as jnp
from turborc_tpu.ops.pallas import bittree_kernel as B_
from turborc_tpu.codecs import rc_tree as RT

assert B_.GROUPS == 2 and B_.CHUNK == 2 and B_.INTERPRET
rng = np.random.default_rng(11)
K = 3 * B_.CHUNK  # 3 grid steps: carry + window slide + queue refill
n = B_.LANES * K - 5
a = rng.choice(12, 2 * n, p=np.r_[0.4, np.full(11, 0.6 / 11)])
data = (np.repeat(a, rng.integers(1, 4, a.size))[:n] + 97).astype(np.uint8)

pay_xla = RT.encode_block(data, use_pallas_encoder=False)
out = RT.decode_block(pay_xla, n)
assert np.array_equal(out, data), "decode-kernel roundtrip vs XLA encoder"

pay_pal = RT.encode_block(data, use_pallas_encoder=True)
assert pay_pal == pay_xla, "pallas encode pipeline != XLA twin payload"
print("bittree interpret roundtrip ok", len(pay_xla))
"""


def test_bittree_kernel_interpret_roundtrip():
    env = dict(os.environ)
    # CHUNK=2: cold-cache interpret compiles of the CHUNK=4 body exceed
    # 30 min on the 1-core test host (see test_kernel_interpret_small)
    env.update(TRC_GROUPS="2", TRC_CHUNK="2", TRC_SYNC="2", TRC_LSYNC="4",
               TRC_INTERPRET="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                       capture_output=True, text=True, timeout=3600,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, f"STDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}"
    assert "bittree interpret roundtrip ok" in r.stdout


def test_bittree_ratio_near_sequential(rng):
    """Nibble-grouped interval subdivision must stay within 1% of the
    bit-exact sequential coder's output size on skewed data (the
    documented rounding cost; see bittree_kernel.py docstring)."""
    import jax.numpy as jnp

    from turborc_tpu.ops.pallas import bittree_kernel as B_
    from turborc_tpu.codecs import rc_bit

    K = 16
    p = 1.0 / np.arange(1, 257) ** 1.3
    data = rng.choice(256, size=B_.LANES * K, p=p / p.sum()).astype(
        np.uint8)
    block = data.reshape(B_.LANES, K)
    tree = B_.warm_tree(data)
    _gs, glens = B_.encode_tile(jnp.asarray(block.astype(np.int32)), K,
                                jnp.asarray(tree))
    tree_words = int(np.asarray(glens).sum())  # incl. 256 state rows/group

    # sequential bit-exact coder on the same lanes (uniform start)
    streams, lengths = rc_bit.encode_device(
        jnp.asarray(block.astype(np.int32)), K)
    seq_words = int(np.asarray(lengths).sum())

    # warm start gives the tree coder an edge; the grouping costs
    # fractions of a percent - assert parity within 1% either way
    assert tree_words <= seq_words * 1.01


def test_bittree_warm_tree_properties(rng):
    from turborc_tpu.ops.pallas import bittree_kernel as B_

    data = rng.integers(0, 256, size=4096).astype(np.uint8)
    t = B_.warm_tree(data)
    assert t.shape == (256,)
    assert t[1:].min() >= 1 and t[1:].max() <= (1 << 15) - 1
    # uniform data: root stays near 1/2
    assert abs(int(t[1]) - (1 << 14)) < 2048
    # skewed data: root reflects the leading bit bias
    lo = B_.warm_tree(np.zeros(1024, np.uint8))
    assert lo[1] <= 16  # all bytes 0 -> first bit never 1
