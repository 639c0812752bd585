"""Generate tests/fixtures/foreign_stars*.kdt — hand-assembled cereal bytes.

VERDICT r3 missing #2: ``stars/kdt.py``'s only validation was round-tripping
its own writer, so a shared wrong assumption between reader and writer could
hide. This generator is deliberately INDEPENDENT of ``write_kdt``: the byte
stream is assembled inline from the cereal spec (big-endian Int64/Float64,
UTF-8-style Char, Word8 constructor tags, record fields in declaration
order — Data.Serialize docs + /root/reference/src/StarMap.hs:30-41's two
0x00 function placeholders), over a HAND-DRAWN unbalanced tree topology
that a median-split builder would never produce (Data.KdMap.Static.build
always splits at the median; a foreign tool or a different kdt version need
not). Two fixtures cover both constructor-tag assignments the GHC Generic
encoding could pin (TreeEmpty declared first vs TreeNode first) — the
reader's layout detection must parse both to the same catalogue.

No GHC exists in this environment (and no network), so a literally
GHC-written file is unobtainable; these fixtures are the strongest
available interop evidence: bytes the repo's writer could not have
produced, matching the documented encoding primitive-for-primitive.

Run:  python scripts/make_kdt_fixture.py   (rewrites tests/fixtures/)
"""

from __future__ import annotations

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures")

# The hand-drawn tree: (pos, mag, class, axisValue, left, right), written
# exactly in this nesting. Positions are unit vectors (cos/sin pairs), the
# topology is an unbalanced right-leaning chain with one left subtree —
# NOT a median split of any axis ordering.
import math


def unit(ra, dec):
    return (math.cos(dec) * math.cos(ra), math.cos(dec) * math.sin(ra),
            math.sin(dec))


TREE = (
    unit(0.1, 0.2), 520, "G", 0.97,
    (
        unit(6.2, -0.3), 900, "M", -0.28,
        None,
        (unit(3.3, 1.4), 150, "O", 0.16, None, None),
    ),
    (
        unit(1.0, 0.0), 1200, "?", 0.54,
        (
            unit(2.0, -1.5), 700, "K", 0.07,
            None,
            (unit(4.4, 0.9), 333, "A", -0.62,
             (unit(5.5, -0.1), 444, "B", 0.99, None, None),
             None),
        ),
        None,
    ),
)


def count(t):
    return 0 if t is None else 1 + count(t[4]) + count(t[5])


def encode_tree(t, empty_tag: int) -> bytes:
    """TreeNode = { left, (point, value), axisValue, right } — cereal
    generic: Word8 tag, then fields in declaration order."""
    if t is None:
        return bytes([empty_tag])
    pos, mag, ch, axv, left, right = t
    return (
        bytes([1 - empty_tag])
        + encode_tree(left, empty_tag)
        + struct.pack(">ddd", *pos)        # V3 Double, fields x y z
        + struct.pack(">q", mag)           # Int -> Int64 big-endian
        + ch.encode("utf-8")               # Char, ASCII -> 1 byte
        + struct.pack(">d", axv)           # axisValue :: Double
        + encode_tree(right, empty_tag)
    )


def main():
    os.makedirs(OUT, exist_ok=True)
    for empty_tag, name in ((0, "foreign_stars_emptyfirst.kdt"),
                            (1, "foreign_stars_nodefirst.kdt")):
        data = (
            b"\x00"                         # _pointAsList placeholder
            + b"\x00"                       # _distSqr placeholder
            + encode_tree(TREE, empty_tag)  # _rootNode
            + struct.pack(">q", count(TREE))  # _size :: Int (trailing)
        )
        path = os.path.join(OUT, name)
        with open(path, "wb") as f:
            f.write(data)
        print(f"{path}: {len(data)} bytes, {count(TREE)} stars")


if __name__ == "__main__":
    main()
