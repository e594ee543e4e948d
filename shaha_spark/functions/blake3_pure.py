"""Pure-Python BLAKE3 (default hash mode, 32-byte output).

Implements the public BLAKE3 specification (O'Connor/Aumasson/Neves/
Wilcox-O'Hearn): 1024-byte chunks of 64-byte blocks compressed with a
7-round ChaCha-derived function, combined in a binary tree whose left
subtree always holds the largest power-of-two number of chunks strictly
smaller than the total.

Used as the UDF kernel for the ``blake3`` algorithm (ref
/root/reference/src/hasher/mod.rs:37-47; known-answer vector ref
tests/integration.rs:71-79) and for driver-side source content
fingerprints (ref src/source/file.rs:43-56). No blake3 wheel is
available in this environment, so the spec implementation lives here;
wordlist inputs are short (single chunk), keeping the slow path cheap.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)

_MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

_CHUNK_LEN = 1024
_BLOCK_LEN = 64

_CHUNK_START = 1
_CHUNK_END = 2
_PARENT = 4
_ROOT = 8


def _rotr(value: int, shift: int) -> int:
    return ((value >> shift) | (value << (32 - shift))) & _MASK32


def _g(state: list[int], a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
    state[a] = (state[a] + state[b] + mx) & _MASK32
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = (state[c] + state[d]) & _MASK32
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = (state[a] + state[b] + my) & _MASK32
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = (state[c] + state[d]) & _MASK32
    state[b] = _rotr(state[b] ^ state[c], 7)


def _compress(
    cv: tuple[int, ...],
    block_words: list[int],
    counter: int,
    block_len: int,
    flags: int,
) -> list[int]:
    state = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        _IV[0], _IV[1], _IV[2], _IV[3],
        counter & _MASK32, (counter >> 32) & _MASK32, block_len, flags,
    ]
    m = list(block_words)
    for round_idx in range(7):
        _g(state, 0, 4, 8, 12, m[0], m[1])
        _g(state, 1, 5, 9, 13, m[2], m[3])
        _g(state, 2, 6, 10, 14, m[4], m[5])
        _g(state, 3, 7, 11, 15, m[6], m[7])
        _g(state, 0, 5, 10, 15, m[8], m[9])
        _g(state, 1, 6, 11, 12, m[10], m[11])
        _g(state, 2, 7, 8, 13, m[12], m[13])
        _g(state, 3, 4, 9, 14, m[14], m[15])
        if round_idx < 6:
            m = [m[p] for p in _MSG_PERMUTATION]
    return [
        state[i] ^ state[i + 8] if i < 8 else state[i] ^ cv[i - 8]
        for i in range(16)
    ]


def _block_words(block: bytes) -> list[int]:
    block = block.ljust(_BLOCK_LEN, b"\x00")
    return [int.from_bytes(block[i : i + 4], "little") for i in range(0, _BLOCK_LEN, 4)]


def _chunk_output(chunk: bytes, chunk_index: int) -> tuple[tuple[int, ...], list[int], int, int, int]:
    """Process all but the final block of a chunk; return the final-compress inputs.

    Returns (cv, final_block_words, counter, block_len, flags) so the caller
    can decide whether the final compression also carries the ROOT flag.
    """
    blocks = [chunk[i : i + _BLOCK_LEN] for i in range(0, len(chunk), _BLOCK_LEN)] or [b""]
    cv: tuple[int, ...] = _IV
    for i, block in enumerate(blocks[:-1]):
        flags = _CHUNK_START if i == 0 else 0
        cv = tuple(_compress(cv, _block_words(block), chunk_index, _BLOCK_LEN, flags)[:8])
    last = blocks[-1]
    flags = _CHUNK_END | (_CHUNK_START if len(blocks) == 1 else 0)
    return cv, _block_words(last), chunk_index, len(last), flags


def _left_subtree_chunks(total: int) -> int:
    """Largest power of two strictly less than ``total`` (total >= 2)."""
    return 1 << (total - 1).bit_length() - 1


def _subtree_cv(chunks: list[bytes], first_index: int) -> tuple[int, ...]:
    if len(chunks) == 1:
        cv, words, counter, block_len, flags = _chunk_output(chunks[0], first_index)
        return tuple(_compress(cv, words, counter, block_len, flags)[:8])
    left_n = _left_subtree_chunks(len(chunks))
    left = _subtree_cv(chunks[:left_n], first_index)
    right = _subtree_cv(chunks[left_n:], first_index + left_n)
    words = list(left) + list(right)
    return tuple(_compress(_IV, words, 0, _BLOCK_LEN, _PARENT)[:8])


def blake3(data: bytes) -> bytes:
    """BLAKE3 digest, default (unkeyed) mode, 32 bytes."""
    chunks = [data[i : i + _CHUNK_LEN] for i in range(0, len(data), _CHUNK_LEN)] or [b""]
    if len(chunks) == 1:
        cv, words, counter, block_len, flags = _chunk_output(chunks[0], 0)
        out = _compress(cv, words, counter, block_len, flags | _ROOT)
    else:
        left_n = _left_subtree_chunks(len(chunks))
        left = _subtree_cv(chunks[:left_n], 0)
        right = _subtree_cv(chunks[left_n:], left_n)
        out = _compress(_IV, list(left) + list(right), 0, _BLOCK_LEN, _PARENT | _ROOT)
    return b"".join(w.to_bytes(4, "little") for w in out[:8])
