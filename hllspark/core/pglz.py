"""PostgreSQL PGLZ compression — encoder for reference-format interop.

The reference extension stores dense counters PGLZ-compressed (its
``hyperloglog_comp`` / aggregate finalfunc path calls ``pg_compress``,
hllutils.c:139-156, which delegates to PostgreSQL's own ``pglz_compress``
from src/common/pg_lzcompress.c with ``PGLZ_strategy_always``).  The repo
already DECODES that format (core/legacy.py:45); this module adds the
encoder so exported counters round-trip INTO a Postgres install running
the reference (core/refformat.py).

This is a faithful replica of PostgreSQL's public ``pglz_compress``
algorithm (history hash chains over a 4096-entry recycling window,
good_match=128 / good_drop=6 for strategy_always, 12-bit offsets,
3..273-byte matches, one control byte per 8 items).  PostgreSQL changed
the history hash function once, so two variants are exposed:

- ``variant="modern"`` (PostgreSQL >= 9.5): hash table scaled to the input
  size (512..8192 slots), ``((s0<<6) ^ (s1<<4) ^ (s2<<2) ^ s3) & mask``.
- ``variant="legacy"`` (PostgreSQL < 9.5): fixed 8192 slots,
  ``((s0<<9) ^ (s1<<6) ^ (s2<<3) ^ s3) & 8191``.

Either stream decodes with ANY pglz_decompress (the wire format never
changed); the variant only affects which matches the encoder finds, i.e.
the exact bytes emitted.  GOLDEN PARITY: re-compressing the decompressed
register payloads of the reference's own v0/v1 update.sql fixtures
reproduces the real Postgres-produced streams BYTE-FOR-BYTE (both
variants agree on that data; good_drop must be 6 — strategy_always's
"use best match algorithm" value, not strategy_default's 10 — the two
were discriminated empirically against those fixtures, whose PGLZ_Header
vl_len also reveals the stored stream carries 4 trailing bytes of
allocator slack that are not part of the stream).
tests/test_reference_interop.py pins this.

Returns None where C returns -1 (stream not smaller than the input):
callers fall back to the uncompressed form, mirroring hll_compress_dense's
keep-if-smaller rule (hyperloglog.c:982-991).

Cost: pure-Python hash-chain LZ, ~90 ms per 16 KiB dense register array
(sparse counters don't take this path at all).  That prices a dense-heavy
100k-sketch egress at ~2.5 CPU-hours — parallelized across executors by
the pandas UDF, and an egress/interop operation by nature, not a query
hot path; the canonical in-cluster format never calls this.
"""

from __future__ import annotations

PGLZ_MAX_MATCH = 273
_HIST_SIZE = 4096  # PGLZ_HISTORY_SIZE; offsets are bounded at 0x0fff anyway
_GOOD_MATCH = 128  # strategy_always match_size_good (clamped to [17, 273])
_GOOD_DROP = 6  # strategy_always match_size_drop ("use best match algorithm")


def _hashsz(slen: int, variant: str) -> int:
    if variant == "legacy":
        return 8192
    if slen < 128:
        return 512
    if slen < 256:
        return 1024
    if slen < 512:
        return 2048
    if slen < 1024:
        return 4096
    return 8192


def pglz_compress(data: bytes, variant: str = "modern") -> bytes | None:
    """Compress ``data``; returns the raw PGLZ stream (no PGLZ_Header), or
    None when no byte is saved (min_comp_rate=0 semantics) — the caller
    keeps the uncompressed form, like pg_compress returning false."""
    if variant not in ("modern", "legacy"):
        raise ValueError(f"unknown pglz variant {variant!r}")
    src = bytes(data)
    slen = len(src)
    if slen == 0:
        return None
    legacy = variant == "legacy"
    mask = _hashsz(slen, variant) - 1
    result_max = slen  # need_rate 0: success iff at least one byte saved

    # history state: entry 0 is INVALID; prev uses -1 for C's NULL pointer
    # (distinct from entry 0 — writes through a next-pointer at entry 0 are
    # the same harmless scribble the C macro performs).
    hist_start = [0] * (mask + 1)
    nxt = [0] * (_HIST_SIZE + 1)
    prv = [-1] * (_HIST_SIZE + 1)
    hidx = [0] * (_HIST_SIZE + 1)
    hpos = [0] * (_HIST_SIZE + 1)
    hist_next = 1
    recycle = False

    # pglz_hist_idx reads through `const char *`: SIGNED on x86/x86-64
    # Postgres builds, so bytes >= 0x80 sign-extend before the shifts/mask
    # (two's-complement & mask, same in Python on negative ints).  We
    # replicate the x86 behavior; a big-endian/ARM build (unsigned char)
    # would bucket differently — C itself is platform-dependent here, and
    # either choice emits a valid stream.  Unreachable for HLL registers
    # (values <= ~64), but this module is public API.
    sgn = [b - 256 if b >= 128 else b for b in range(256)]

    if legacy:

        def hist_hash(p: int) -> int:
            if slen - p < 4:
                return sgn[src[p]] & mask
            return (
                (sgn[src[p]] << 9) ^ (sgn[src[p + 1]] << 6) ^ (sgn[src[p + 2]] << 3)
                ^ sgn[src[p + 3]]
            ) & mask

    else:

        def hist_hash(p: int) -> int:
            if slen - p < 4:
                return sgn[src[p]] & mask
            return (
                (sgn[src[p]] << 6) ^ (sgn[src[p + 1]] << 4) ^ (sgn[src[p + 2]] << 2)
                ^ sgn[src[p + 3]]
            ) & mask

    def hist_add(p: int) -> None:
        nonlocal hist_next, recycle
        h = hist_hash(p)
        e = hist_next
        if recycle:
            # unlink the entry being overwritten from its old list
            if prv[e] == -1:
                hist_start[hidx[e]] = nxt[e]
            else:
                nxt[prv[e]] = nxt[e]
            prv[nxt[e]] = prv[e]  # entry-0 scribble when nxt[e]==0, as in C
        nxt[e] = hist_start[h]
        prv[e] = -1
        hidx[e] = h
        hpos[e] = p
        prv[hist_start[h]] = e  # entry-0 scribble when the list was empty
        hist_start[h] = e
        hist_next += 1
        if hist_next >= _HIST_SIZE + 1:
            hist_next = 1
            recycle = True

    def find_match(ip0: int) -> tuple[int, int] | None:
        best_len = 0
        best_off = 0
        good = _GOOD_MATCH
        ent = hist_start[hist_hash(ip0)]
        while ent != 0:
            hp0 = hpos[ent]
            off = ip0 - hp0
            if off >= 0x0FFF:
                break
            thislen = 0
            if best_len >= 16:
                # memcmp shortcut: only re-scan entries that at least tie the
                # current best (bounds: ip0+best_len <= slen because best_len
                # came from an end-bounded scan at this same ip0)
                if src[ip0 : ip0 + best_len] == src[hp0 : hp0 + best_len]:
                    thislen = best_len
                    ip, hp = ip0 + best_len, hp0 + best_len
                    while ip < slen and src[ip] == src[hp] and thislen < PGLZ_MAX_MATCH:
                        thislen += 1
                        ip += 1
                        hp += 1
            else:
                ip, hp = ip0, hp0
                while ip < slen and src[ip] == src[hp] and thislen < PGLZ_MAX_MATCH:
                    thislen += 1
                    ip += 1
                    hp += 1
            if thislen > best_len:
                best_len = thislen
                best_off = off
            ent = nxt[ent]
            if best_len >= good:
                break
            good -= good * _GOOD_DROP // 100
        if best_len > 2:
            return best_len, best_off
        return None

    out = bytearray()
    ctrl_pos = -1
    ctrlb = 0
    ctrl = 0
    dp = 0
    while dp < slen:
        if len(out) >= result_max:
            return None
        m = find_match(dp)
        if (ctrl & 0xFF) == 0:  # pglz_out_ctrl: start a new control byte
            if ctrl_pos >= 0:
                out[ctrl_pos] = ctrlb
            ctrl_pos = len(out)
            out.append(0)
            ctrlb = 0
            ctrl = 1
        if m is not None:
            mlen, moff = m
            ctrlb |= ctrl
            ctrl = (ctrl << 1) & 0xFF
            if mlen > 17:
                out.append(((moff & 0xF00) >> 4) | 0x0F)
                out.append(moff & 0xFF)
                out.append(mlen - 18)
            else:
                out.append(((moff & 0xF00) >> 4) | (mlen - 3))
                out.append(moff & 0xFF)
            for _ in range(mlen):
                hist_add(dp)
                dp += 1
        else:
            ctrl = (ctrl << 1) & 0xFF
            out.append(src[dp])
            hist_add(dp)
            dp += 1
    if ctrl_pos >= 0:
        out[ctrl_pos] = ctrlb
    if len(out) >= result_max:
        return None
    return bytes(out)
