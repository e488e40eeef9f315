"""Independent pure-Python XTC (xdrfile 3dfcoord) reference codec.

Written from the PUBLISHED xdrfile format specification / algorithm
(the libxdrf 3dfcoord integer compression used by GROMACS), deliberately
NOT derived from spinrelax_tpu/native/xtc.cpp: its purpose is to
cross-validate the C++ codec against a second, independent reading of
the spec — the closest available substitute for foreign golden bytes in
this offline container (no GROMACS/mdtraj/MDAnalysis present).

Key format facts encoded here (all from the public spec):
- big-endian XDR ints/floats; frame header magic 1995, natoms, step,
  time, 3x3 box.
- <= 9 atoms: coordinates stored as plain XDR floats (no compression).
- otherwise: precision, minint[3], maxint[3], smallidx, nbytes, then an
  MSB-first bitstream of mixed-radix "large" triples (relative to
  minint) and runs of small deltas with an adaptive word size indexed
  into the historical magicints table (quirks 5060, 524287, 8388607
  preserved verbatim — files in the wild depend on them).
- run flag bit after each large atom (1 = run length CHANGED, new 5-bit
  field follows; 0 = previous run length persists); the field packs
  run-length*3 + (is_smaller+1); within a run the first small atom is
  exchanged with the preceding large atom (water-molecule optimisation).
- compressed payload padded to a 4-byte boundary.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = 1995
FIRSTIDX = 9

MAGICINTS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 10, 12, 16, 20, 25, 32, 40, 50, 64, 80,
    101, 128, 161, 203, 256, 322, 406, 512, 645, 812, 1024, 1290, 1625,
    2048, 2580, 3250, 4096, 5060, 6501, 8192, 10321, 13003, 16384, 20642,
    26007, 32768, 41285, 52015, 65536, 82570, 104031, 131072, 165140,
    208063, 262144, 330280, 416127, 524287, 660561, 832255, 1048576,
    1321122, 1664510, 2097152, 2642245, 3329021, 4194304, 5284491, 6658042,
    8388607, 10568983, 13316085, 16777216,
]
LASTIDX = len(MAGICINTS) - 1


def sizeofint(size: int) -> int:
    num = 1
    nbits = 0
    while size >= num and nbits < 32:
        nbits += 1
        num <<= 1
    return nbits


def sizeofints(sizes) -> int:
    """Bits needed for the mixed-radix product (byte-array big-number
    arithmetic as in the spec)."""
    nbytes = 1
    bytes_ = [1]
    for s in sizes:
        tmp = 0
        out = []
        for b in bytes_:
            tmp = b * s + tmp
            out.append(tmp & 0xFF)
            tmp >>= 8
        while tmp:
            out.append(tmp & 0xFF)
            tmp >>= 8
        bytes_ = out
        nbytes = len(bytes_)
    num = 1
    nbits = 0
    while bytes_[nbytes - 1] >= num:
        nbits += 1
        num *= 2
    return nbits + (nbytes - 1) * 8


class BitWriter:
    """MSB-first bitstream (each value's most significant requested bit
    is written first), matching the spec's sendbits."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def bits(self, nbits: int, value: int):
        value &= (1 << nbits) - 1 if nbits < 64 else ~0
        self.acc = (self.acc << nbits) | value
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def close(self) -> bytes:
        if self.nacc:
            self.out.append((self.acc << (8 - self.nacc)) & 0xFF)
            self.acc = 0
            self.nacc = 0
        return bytes(self.out)


def _bignum_from(nums, sizes):
    """Little-endian base-256 byte array of the mixed-radix number
    ((nums[0]*sizes[1] + nums[1])*sizes[2] + nums[2])..."""
    bytes_ = []
    tmp = int(nums[0])
    bytes_ = []
    while tmp:
        bytes_.append(tmp & 0xFF)
        tmp >>= 8
    if not bytes_:
        bytes_ = [0]
    for s, n in zip(sizes[1:], nums[1:]):
        # bytes_ = bytes_ * s + n
        carry = int(n)
        out = []
        for b in bytes_:
            v = b * int(s) + carry
            out.append(v & 0xFF)
            carry = v >> 8
        while carry:
            out.append(carry & 0xFF)
            carry >>= 8
        bytes_ = out
    return bytes_


def write_ints(bw: BitWriter, nbits: int, sizes, nums):
    bytes_ = _bignum_from(nums, sizes)
    nbytes = len(bytes_)
    if nbits >= nbytes * 8:
        for b in bytes_:
            bw.bits(8, b)
        bw.bits(nbits - nbytes * 8, 0)
    else:
        for b in bytes_[: nbytes - 1]:
            bw.bits(8, b)
        bw.bits(nbits - (nbytes - 1) * 8, bytes_[nbytes - 1])


class BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit cursor

    def bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ints(self, nbits: int, sizes):
        nbytes = 0
        bytes_ = []
        rem = nbits
        while rem > 8:
            bytes_.append(self.bits(8))
            rem -= 8
        if rem > 0:
            bytes_.append(self.bits(rem))
        nbytes = len(bytes_)
        nums = [0] * len(sizes)
        for i in range(len(sizes) - 1, 0, -1):
            num = 0
            for j in range(nbytes - 1, -1, -1):
                num = (num << 8) | bytes_[j]
                p = num // int(sizes[i])
                bytes_[j] = p
                num -= p * int(sizes[i])
            nums[i] = num
        nums[0] = bytes_[0]
        for j in range(1, min(nbytes, 4)):
            nums[0] |= bytes_[j] << (8 * j)
        return nums


# ---------------------------------------------------------------------------
# Frame-level decode
# ---------------------------------------------------------------------------


def read_frames(fn: str):
    """Decode every frame -> (xyz (nF, nA, 3) f32 [nm], boxes, times) —
    same return order as spinrelax_tpu.io.native.read_xtc."""
    xyzs, times, boxes = [], [], []
    with open(fn, "rb") as fp:
        data = fp.read()
    off = 0
    n = len(data)
    while off < n:
        (magic, natoms, step) = struct.unpack_from(">iii", data, off)
        if magic != MAGIC:
            raise ValueError(f"bad magic {magic} at offset {off}")
        (time,) = struct.unpack_from(">f", data, off + 12)
        box = np.array(
            struct.unpack_from(">9f", data, off + 16), dtype=np.float32
        ).reshape(3, 3)
        off += 16 + 36
        (lsize,) = struct.unpack_from(">i", data, off)
        off += 4
        if lsize != natoms:
            raise ValueError("3dfcoord size != natoms")
        if natoms <= 9:
            flat = struct.unpack_from(f">{3 * natoms}f", data, off)
            off += 12 * natoms
            xyz = np.array(flat, dtype=np.float32).reshape(natoms, 3)
        else:
            (precision,) = struct.unpack_from(">f", data, off)
            minint = list(struct.unpack_from(">3i", data, off + 4))
            maxint = list(struct.unpack_from(">3i", data, off + 16))
            (smallidx,) = struct.unpack_from(">i", data, off + 28)
            (nbytes,) = struct.unpack_from(">i", data, off + 32)
            off += 36
            payload = data[off : off + nbytes]
            off += (nbytes + 3) & ~3  # 4-byte padding
            xyz = _decode_coords(
                natoms, precision, minint, maxint, smallidx, payload
            )
        xyzs.append(xyz)
        times.append(time)
        boxes.append(box)
    return (
        np.stack(xyzs),
        np.stack(boxes),
        np.asarray(times, np.float32),
    )


def _decode_coords(natoms, precision, minint, maxint, smallidx, payload):
    sizeint = [maxint[k] - minint[k] + 1 for k in range(3)]
    if any(s > 0xFFFFFF for s in sizeint):
        bitsizeint = [sizeofint(s) for s in sizeint]
        bitsize = 0
    else:
        bitsize = sizeofints(sizeint)
    small = MAGICINTS[smallidx] // 2
    smaller = MAGICINTS[max(FIRSTIDX, smallidx - 1)] // 2
    sizesmall = [MAGICINTS[smallidx]] * 3
    inv = 1.0 / precision
    br = BitReader(payload)
    out = np.empty((natoms, 3), np.float32)
    i = 0
    run = 0
    prev = [0, 0, 0]
    while i < natoms:
        if bitsize == 0:
            this = [br.bits(bitsizeint[k]) for k in range(3)]
        else:
            this = br.ints(bitsize, sizeint)
        this = [this[k] + minint[k] for k in range(3)]
        i += 1
        prev = list(this)
        # Canonical: `run` PERSISTS when flag == 0 (GROMACS only signals
        # run-length CHANGES); resetting it here would desync against
        # encoders that reuse a run length across consecutive blocks.
        flag = br.bits(1)
        is_smaller = 0
        if flag == 1:
            run = br.bits(5)
            is_smaller = run % 3
            run -= is_smaller
            is_smaller -= 1
        if run > 0:
            for k in range(0, run, 3):
                this = br.ints(smallidx, sizesmall)
                this = [this[c] + prev[c] - small for c in range(3)]
                i += 1
                if k == 0:
                    # water-molecule optimisation: first small atom was
                    # stored BEFORE the large one — exchange them.
                    this, prev = prev, this
                    out[i - 2] = np.float32(prev) * inv
                else:
                    prev = list(this)
                out[i - 1] = np.float32(this) * inv
        else:
            out[i - 1] = np.float32(this) * inv
        if is_smaller < 0:
            smallidx += is_smaller
            small = smaller
            smaller = (
                MAGICINTS[smallidx - 1] // 2 if smallidx > FIRSTIDX else 0
            )
            sizesmall = [MAGICINTS[smallidx]] * 3
        elif is_smaller > 0:
            smallidx += is_smaller
            smaller = small
            small = MAGICINTS[smallidx] // 2
            sizesmall = [MAGICINTS[smallidx]] * 3
    return out


# ---------------------------------------------------------------------------
# Frame-level encode (valid conforming stream; no run compression — every
# atom is an absolute triple with a zero flag bit.  Any conforming decoder
# must read it.)
# ---------------------------------------------------------------------------


def write_frames(fn: str, xyz, times=None, boxes=None, precision=1000.0):
    xyz = np.asarray(xyz, np.float32)
    nf, natoms, _ = xyz.shape
    times = (
        np.arange(nf, dtype=np.float32) if times is None else np.asarray(times)
    )
    with open(fn, "wb") as fp:
        for f in range(nf):
            box = (
                np.eye(3, dtype=np.float32)
                if boxes is None
                else np.asarray(boxes[f], np.float32)
            )
            fp.write(struct.pack(">iii", MAGIC, natoms, f))
            fp.write(struct.pack(">f", float(times[f])))
            fp.write(struct.pack(">9f", *box.reshape(9)))
            fp.write(struct.pack(">i", natoms))
            if natoms <= 9:
                fp.write(
                    struct.pack(f">{3 * natoms}f", *xyz[f].reshape(-1))
                )
                continue
            ints = np.rint(xyz[f] * precision).astype(np.int64)
            minint = ints.min(axis=0)
            maxint = ints.max(axis=0)
            sizeint = [int(maxint[k] - minint[k] + 1) for k in range(3)]
            if any(s > 0xFFFFFF for s in sizeint):
                bitsizeint = [sizeofint(s) for s in sizeint]
                bitsize = 0
            else:
                bitsize = sizeofints(sizeint)
            smallidx = FIRSTIDX
            bw = BitWriter()
            rel = (ints - minint[None, :]).astype(np.int64)
            for a in range(natoms):
                if bitsize == 0:
                    for k in range(3):
                        bw.bits(bitsizeint[k], int(rel[a, k]))
                else:
                    write_ints(bw, bitsize, sizeint, [int(v) for v in rel[a]])
                bw.bits(1, 0)  # no run
            payload = bw.close()
            fp.write(struct.pack(">f", float(precision)))
            fp.write(struct.pack(">3i", *[int(v) for v in minint]))
            fp.write(struct.pack(">3i", *[int(v) for v in maxint]))
            fp.write(struct.pack(">i", smallidx))
            fp.write(struct.pack(">i", len(payload)))
            fp.write(payload)
            pad = (-len(payload)) % 4
            fp.write(b"\x00" * pad)
