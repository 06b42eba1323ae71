"""Property-based tests (hypothesis) for the pure kernels.

The pytest suite pins known fixtures; these generate adversarial
inputs for the invariants that must hold for EVERY input at 100 TB:
codec round-trips (a single mis-decoded block corrupts a tier
restore), PNG structural validity (every builder output must decode),
and the simhash pigeonhole recall contract.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tstoken.compress import (decode_timestamps, decode_values,
                              encode_timestamps, encode_values)
from tstoken.plotting import png_decode_size, png_encode

# bounded float64s that survive the codec's bit-level transport
# (NaN excluded: the tiers never store NaN — gap-fill materializes
# explicit zero rows instead)
_vals = st.lists(
    st.floats(min_value=-1e12, max_value=1e12,
              allow_nan=False, allow_infinity=False, width=64),
    min_size=1, max_size=300)

# epoch-second timestamps, unsorted allowed (encoder takes them as
# given; rollup always feeds sorted, but the codec must not corrupt
# arbitrary deltas either)
_ts = st.lists(st.integers(min_value=0, max_value=2 ** 40),
               min_size=1, max_size=300)


class TestCodecRoundTrip:
    @given(_vals)
    @settings(max_examples=200, deadline=None)
    def test_values_roundtrip_exact(self, vals):
        arr = np.asarray(vals, dtype=np.float64)
        out = decode_values(encode_values(arr))
        # bit-exact, not allclose: Gorilla XOR transports the original
        # IEEE-754 words or it is broken
        assert arr.tobytes() == out.tobytes()

    @given(_ts)
    @settings(max_examples=200, deadline=None)
    def test_timestamps_roundtrip_exact(self, ts):
        arr = np.asarray(ts, dtype=np.int64)
        out = decode_timestamps(encode_timestamps(arr))
        assert (arr == out).all()

    @given(st.integers(min_value=0, max_value=2 ** 52),
           st.integers(min_value=1, max_value=10 ** 6),
           st.integers(min_value=2, max_value=64))
    @settings(max_examples=100, deadline=None)
    def test_regular_grid_timestamps(self, start, step, n):
        # the actual tier shape: a regular grid (delta-of-delta ~ 0)
        arr = start + step * np.arange(n, dtype=np.int64)
        out = decode_timestamps(encode_timestamps(arr))
        assert (arr == out).all()


class TestPngProperty:
    @given(st.integers(min_value=1, max_value=40),
           st.integers(min_value=1, max_value=40),
           st.integers(min_value=0, max_value=2 ** 32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_any_rgb_array_encodes_decodably(self, w, h, seed):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        raw = png_encode(rgb)
        assert png_decode_size(raw) == (w, h)


class TestSimhashRecallProperty:
    @given(st.integers(min_value=0, max_value=2 ** 63 - 1),
           st.integers(min_value=1, max_value=8),
           st.integers(min_value=0, max_value=2 ** 32 - 1))
    @settings(max_examples=100, deadline=None)
    def test_pigeonhole_chunking_covers_distance(self, base, max_h,
                                                 seed):
        """For ANY pair at hamming <= max_h, at least one of the
        max_h+1 chunks must be untouched (the blocking guarantee the
        band join relies on)."""
        rng = np.random.default_rng(seed)
        flip_bits = rng.choice(64, size=max_h, replace=False)
        other = base
        for b in flip_bits:
            other ^= 1 << int(b)
        n_chunks = max_h + 1
        bounds = [(c * 64) // n_chunks for c in range(n_chunks)] + [64]
        shared = False
        for c in range(n_chunks):
            lo, hi = bounds[c], bounds[c + 1]
            mask = ((1 << (hi - lo)) - 1) << lo
            if (base & mask) == (other & mask):
                shared = True
        assert shared
