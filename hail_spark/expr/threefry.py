"""Threefry-4x64 counter-based RNG — bit-exact with the reference.

Parity target: ``is/hail/expr/ir/Random.scala`` (Threefry object,
PMAC construction, ThreefryRandomEngine). The reference uses
Threefry-4x64 with 20 rounds (Salmon et al. 2011 "Parallel random
numbers: as easy as 1, 2, 3"; rotation constants from the Skein
specification) keyed by a fixed default key, with a PMAC-style hash
mapping (nonce, staticID, message) to a per-stream state.

This module reproduces, bit for bit:

* ``encrypt`` — the 20-round block cipher (verified against the Skein
  reference KAT vectors the reference's own RandomSuite.scala:16 uses);
* ``pmac`` / ``pmac_hash`` — the padded-message MAC (Random.scala:255);
* ``ThreefryRandomEngine`` — the buffered engine with the reference's
  exact ``nextLong``/``nextInt`` buffer discipline, its
  infinite-precision-rounding ``nextDouble`` (Random.scala:540 — NOT
  the usual ``(bits >>> 11) / 2^53``), and the polar-method
  ``nextGaussian``.

Given the same (nonce, staticID, message) a stream here equals the
reference's stream exactly. What is NOT replicated is how the
reference's IR assigns per-row rng states inside lowered pipelines
(SURVEY-sanctioned deviation — our column-level ``rand_*`` functions
use md5-seeded streams); this module is for users who need
reference-identical draws for a known stream identity.

``encrypt_batch`` vectorizes the cipher over numpy uint64 counter
arrays (~50 ns/block), so bulk generation inside a pandas UDF stays
C-speed — one engine state broadcast, counters = row indices.
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1

KEY_CONST = 0x1BD11BDAA9FC1A22
STATIC_TWEAK = _M64  # -1L
FINAL_BLOCK_NO_PAD_TWEAK = _M64 - 1  # -2L
FINAL_BLOCK_PADDED_TWEAK = _M64 - 2  # -3L

ROT_CONSTS = (
    (14, 16), (52, 57), (23, 40), (5, 37),
    (25, 33), (46, 12), (58, 22), (32, 32),
)

DEFAULT_NUM_ROUNDS = 20


def expand_key(k: list[int]) -> list[int]:
    """4-word key -> 5 words (xor-parity word, Random.scala:42)."""
    assert len(k) == 4
    k = [x & _M64 for x in k]
    k4 = k[0] ^ k[1] ^ k[2] ^ k[3] ^ KEY_CONST
    return k + [k4]


DEFAULT_KEY = expand_key([
    0x215D6DFDB7DFDF6B,
    0x045CFA043329C49F,
    0x9EC75A93692444DD,
    0x1284681663220F1C,
])


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _M64


def encrypt(k: list[int], t: tuple[int, int], x: list[int],
            rounds: int = DEFAULT_NUM_ROUNDS) -> list[int]:
    """Threefry-4x64 block encrypt (Random.scala:181); returns the new
    4-word block (input not mutated)."""
    assert len(k) == 5 and len(x) == 4
    tw = (t[0] & _M64, t[1] & _M64, (t[0] ^ t[1]) & _M64)
    x = [v & _M64 for v in x]
    for d in range(rounds):
        if d % 4 == 0:
            s = d // 4
            x[0] = (x[0] + k[s % 5]) & _M64
            x[1] = (x[1] + k[(s + 1) % 5] + tw[s % 3]) & _M64
            x[2] = (x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]) & _M64
            x[3] = (x[3] + k[(s + 3) % 5] + s) & _M64
        r0, r1 = ROT_CONSTS[d % 8]
        x[0] = (x[0] + x[1]) & _M64
        x[1] = _rotl(x[1], r0) ^ x[0]
        x[2] = (x[2] + x[3]) & _M64
        x[3] = _rotl(x[3], r1) ^ x[2]
        x[1], x[3] = x[3], x[1]
    if rounds % 4 == 0:
        s = rounds // 4
        x[0] = (x[0] + k[s % 5]) & _M64
        x[1] = (x[1] + k[(s + 1) % 5] + tw[s % 3]) & _M64
        x[2] = (x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]) & _M64
        x[3] = (x[3] + k[(s + 3) % 5] + s) & _M64
    return x


def pmac_hash_from_state(sum4: list[int], message: list[int]) -> tuple[list[int], int]:
    """(hash words, final tweak) — Random.scala:278."""
    length = len(message)
    padded_length = max((length + 3) & ~3, 4)
    padded = padded_length != length
    msg = [m & _M64 for m in message] + [0] * (padded_length - length)
    if padded:
        msg[length] = 1
    s = [v & _M64 for v in sum4]
    i = 0
    while i + 4 < padded_length:
        x = encrypt(DEFAULT_KEY, (i, 0), msg[i : i + 4])
        for j in range(4):
            s[j] ^= x[j]
        i += 4
    for j in range(4):
        s[j] ^= msg[i + j]
    tweak = FINAL_BLOCK_PADDED_TWEAK if padded else FINAL_BLOCK_NO_PAD_TWEAK
    return s, tweak


def pmac_hash(nonce: int, static_id: int, message: list[int]) -> tuple[list[int], int]:
    sum4 = encrypt(DEFAULT_KEY, (STATIC_TWEAK, 0), [nonce, static_id, 0, 0])
    return pmac_hash_from_state(sum4, message)


def pmac(nonce: int, static_id: int, message: list[int]) -> list[int]:
    h, tweak = pmac_hash(nonce, static_id, message)
    return encrypt(DEFAULT_KEY, (tweak, 0), h)


class ThreefryRandomEngine:
    """The reference's buffered engine (Random.scala:406): state is a
    4-word block encrypted with (tweak, counter); the buffer serves 8
    32-bit ints / 4 longs per encryption, with the exact int-parity and
    long-alignment discipline of the reference."""

    def __init__(self, key=None, state=(0, 0, 0, 0), tweak=0):
        self.key = list(key) if key is not None else list(DEFAULT_KEY)
        self.state = [s & _M64 for s in state]
        self.tweak = tweak & _M64
        self.counter = 0
        self.buffer = [0, 0, 0, 0]
        self.used_ints = 8
        self._buffered_gaussian = None

    @classmethod
    def from_pmac(cls, nonce: int, static_id: int, message: list[int]):
        h, tweak = pmac_hash(nonce, static_id, message)
        return cls(state=h, tweak=tweak)

    def _fill(self):
        self.buffer = encrypt(self.key, (self.tweak, self.counter), self.state)
        self.used_ints = 0
        self.counter += 1

    def next_long(self) -> int:
        self.used_ints += self.used_ints & 1
        if self.used_ints >= 8:
            self._fill()
        result = self.buffer[self.used_ints >> 1]
        self.used_ints += 2
        return result

    def next_int(self) -> int:
        if self.used_ints >= 8:
            self._fill()
        result = self.buffer[self.used_ints >> 1]
        self.used_ints += 1
        shift = (self.used_ints & 1) << 5
        return (result >> shift) & 0xFFFFFFFF

    def next_double(self) -> float:
        """Infinite-precision-real rounding (Random.scala:553), not the
        equidistant (bits >>> 11)/2^53 grid."""
        import struct

        bits = self.next_long()
        exponent = 1022
        while bits == 0:
            bits = self.next_long()
            exponent -= 64
        e = (bits & -bits).bit_length() - 1  # trailing zeros
        exponent -= e
        significand = (bits if e < 12 else self.next_long()) >> 12
        result = ((exponent & 0x7FF) << 52) | significand
        return struct.unpack("<d", struct.pack("<Q", result))[0]

    def next_gaussian(self) -> float:
        import math

        if self._buffered_gaussian is not None:
            g = self._buffered_gaussian
            self._buffered_gaussian = None
            return g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self._buffered_gaussian = v2 * mult
        return v1 * mult


def encrypt_batch(key: list[int], tweak: int, state: list[int],
                  counters: np.ndarray) -> np.ndarray:
    """Vectorized Threefry over a uint64 counter array: returns an
    (n, 4) uint64 matrix, row i == encrypt(key, (tweak, counters[i]),
    state). This is the bulk path for reference-identical per-row
    draws inside an Arrow-batched UDF — numpy does the 20 rounds over
    the whole batch at C speed."""
    counters = np.asarray(counters, dtype=np.uint64)
    n = counters.shape[0]
    k = [np.uint64(x) for x in key]
    t0 = np.uint64(tweak & _M64)
    t2_arr = t0 ^ counters
    x = [np.full(n, np.uint64(s & _M64)) for s in state]
    tw = (np.full(n, t0), counters, t2_arr)

    def rotl(a, r):
        r_ = np.uint64(r)
        return (a << r_) | (a >> np.uint64(64 - r))

    with np.errstate(over="ignore"):
        for d in range(DEFAULT_NUM_ROUNDS):
            if d % 4 == 0:
                s = d // 4
                x[0] = x[0] + k[s % 5]
                x[1] = x[1] + k[(s + 1) % 5] + tw[s % 3]
                x[2] = x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]
                x[3] = x[3] + k[(s + 3) % 5] + np.uint64(s)
            r0, r1 = ROT_CONSTS[d % 8]
            x[0] = x[0] + x[1]
            x[1] = rotl(x[1], r0) ^ x[0]
            x[2] = x[2] + x[3]
            x[3] = rotl(x[3], r1) ^ x[2]
            x[1], x[3] = x[3], x[1]
        s = DEFAULT_NUM_ROUNDS // 4
        x[0] = x[0] + k[s % 5]
        x[1] = x[1] + k[(s + 1) % 5] + tw[s % 3]
        x[2] = x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]
        x[3] = x[3] + k[(s + 3) % 5] + np.uint64(s)
    return np.stack(x, axis=1)


def encrypt_batch_states(key: list[int], tweak: int, states: np.ndarray,
                         counter: int = 0) -> np.ndarray:
    """Vectorized Threefry with PER-ROW state words and one fixed
    (tweak, counter): returns an (n, 4) uint64 matrix, row i ==
    encrypt(key, (tweak, counter), states[i]). This is the
    one-stream-per-row bulk path (each row's state came from its own
    pmac hash), complementing ``encrypt_batch``'s
    one-stream-many-counters shape."""
    states = np.asarray(states, dtype=np.uint64)
    n = states.shape[0]
    k = [np.uint64(v) for v in key]
    t0 = np.uint64(tweak & _M64)
    t1 = np.uint64(counter & _M64)
    tw = (t0, t1, t0 ^ t1)
    x = [states[:, j].copy() for j in range(4)]

    def rotl(a, r):
        r_ = np.uint64(r)
        return (a << r_) | (a >> np.uint64(64 - r))

    with np.errstate(over="ignore"):
        for d in range(DEFAULT_NUM_ROUNDS):
            if d % 4 == 0:
                s = d // 4
                x[0] = x[0] + k[s % 5]
                x[1] = x[1] + k[(s + 1) % 5] + tw[s % 3]
                x[2] = x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]
                x[3] = x[3] + k[(s + 3) % 5] + np.uint64(s)
            r0, r1 = ROT_CONSTS[d % 8]
            x[0] = x[0] + x[1]
            x[1] = rotl(x[1], r0) ^ x[0]
            x[2] = x[2] + x[3]
            x[3] = rotl(x[3], r1) ^ x[2]
            x[1], x[3] = x[3], x[1]
        s = DEFAULT_NUM_ROUNDS // 4
        x[0] = x[0] + k[s % 5]
        x[1] = x[1] + k[(s + 1) % 5] + tw[s % 3]
        x[2] = x[2] + k[(s + 2) % 5] + tw[(s + 1) % 3]
        x[3] = x[3] + k[(s + 3) % 5] + np.uint64(s)
    return np.stack(x, axis=1)


def pmac_states_single_word(nonce: int, static_id: int,
                            messages: np.ndarray) -> tuple[np.ndarray, int]:
    """Vectorized pmac_hash for the common stream identity
    message=[uid] (one word): returns the (n, 4) engine states and the
    shared final tweak. Mirrors pmac_hash_from_state exactly for
    length-1 messages: padded block is [uid, 1, 0, 0], so the state is
    sum4 xor that block and the tweak is the padded-final marker."""
    sum4 = encrypt(DEFAULT_KEY, (STATIC_TWEAK, 0), [nonce, static_id, 0, 0])
    uids = np.asarray(messages, dtype=np.uint64)
    states = np.empty((uids.shape[0], 4), dtype=np.uint64)
    states[:, 0] = np.uint64(sum4[0]) ^ uids
    states[:, 1] = np.uint64(sum4[1] ^ 1)
    states[:, 2] = np.uint64(sum4[2])
    states[:, 3] = np.uint64(sum4[3])
    return states, FINAL_BLOCK_PADDED_TWEAK
