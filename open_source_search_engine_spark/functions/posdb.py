"""Posdb constants and posting-field packing.

The reference packs each posting into an 18-byte key (``Posdb.h:3-27``);
we carry the same fields as explicit columns at build time and pack the
per-position context fields into 3 bytes inside the servable posting blob
(see ``codec.py``). Field widths/limits from ``Posdb.h:64-86``.
"""

from __future__ import annotations

MAXSITERANK = 0x0F
MAXLANGID = 0x3F
MAXWORDPOS = 0x3FFFF
MAXDENSITYRANK = 0x1F
MAXWORDSPAMRANK = 0x0F
MAXDIVERSITYRANK = 0x0F
MAXHASHGROUP = 0x0F

# hash groups (Posdb.h:75-86)
HASHGROUP_BODY = 0
HASHGROUP_TITLE = 1
HASHGROUP_HEADING = 2
HASHGROUP_INLIST = 3
HASHGROUP_INMETATAG = 4
HASHGROUP_INLINKTEXT = 5
HASHGROUP_INTAG = 6
HASHGROUP_NEIGHBORHOOD = 7
HASHGROUP_INTERNALINLINKTEXT = 8
HASHGROUP_INURL = 9
HASHGROUP_INMENU = 10
HASHGROUP_END = 11

HASHGROUP_NAMES = (
    "body", "title", "heading", "inlist", "inmetatag", "inlinktext",
    "intag", "neighborhood", "internalinlinktext", "inurl", "inmenu",
)

# synonym flags (Posdb.h:24-27)
SYN_ORIGINAL = 0
SYN_CONJUGATE = 1  # conjugate/singular/plural (possessive-stripped too)
SYN_SYNONYM = 2
SYN_HYPONYM = 3

# default ranking weights (Parms.cpp:4067-4167), indexed by hash group
DEFAULT_HASHGROUP_WEIGHTS = (
    1.0,   # body
    8.0,   # title
    1.5,   # heading
    0.3,   # inlist
    0.1,   # inmetatag
    16.0,  # inlinktext
    1.0,   # intag
    0.0,   # neighborhood
    4.0,   # internalinlinktext
    1.0,   # inurl
    0.2,   # inmenu
)


def site_rank_from_inlinks(site_num_inlinks: int) -> int:
    """getSiteRank step function (Msg25.cpp:4974-4990)."""
    n = site_num_inlinks
    if n <= 0:
        return 0
    if n <= 5:
        return n
    if n <= 9:
        return 6
    if n <= 19:
        return 7
    if n <= 39:
        return 8
    if n <= 79:
        return 9
    if n <= 199:
        return 10
    if n <= 499:
        return 11
    if n <= 999:
        return 12
    if n <= 1999:
        return 13
    if n <= 9999:
        return 14
    return 15


def pack_ctx(hash_group: int, density: int, diversity: int, wordspam: int, syn: int) -> int:
    """Pack the 5 per-position context fields into 19 bits (3 bytes):
    hg(4) | den(5) | div(4) | spam(4) | syn(2)."""
    return (
        ((hash_group & 0xF) << 15)
        | ((density & 0x1F) << 10)
        | ((diversity & 0xF) << 6)
        | ((wordspam & 0xF) << 2)
        | (syn & 0x3)
    )


def unpack_ctx(v: int) -> tuple[int, int, int, int, int]:
    return (
        (v >> 15) & 0xF,
        (v >> 10) & 0x1F,
        (v >> 6) & 0xF,
        (v >> 2) & 0xF,
        v & 0x3,
    )
