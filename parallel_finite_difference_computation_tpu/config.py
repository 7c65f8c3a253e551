"""Parameter parsing and run configuration.

Reference-compatible replacement for the two config systems in the upstream
suite:

* the hand-rolled ``key=value`` parser (``cuda_reference_RTM/lib/src/functions.c:5-75``)
  with defaults applied in ``init_args`` (``cuda_reference_RTM/src/fd-code.cu:343-378``)
* the Seismic-Unix ``par=input.dat`` getpar layer used by the CPU pipeline
  (``dpct_gpu_rtm_domain_division/src/mod_main.cpp:58-85``)

Both accept the same ``input.dat`` files; this module parses them verbatim.
The reference parser matches keys by substring (``strstr``), which makes e.g.
``nz`` match the ``nzb`` line unless guarded; we implement exact-key matching
over the reference's key set, which yields identical results on every
``input.dat`` shipped with the reference.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

__all__ = ["Params", "parse_input_dat", "Geometry"]

_STR_KEYS = ("tmpdir", "vpfile", "datfile", "vel_ext_file")
_INT_KEYS = ("nz", "nx", "nt", "ns", "sz", "fsx", "ds", "gz",
             "order", "nzb", "nxb", "iss", "rnd")
_FLOAT_KEYS = ("dz", "dx", "dt", "fpeak", "fac")


@dataclasses.dataclass
class Params:
    """Flat run parameters, mirroring the reference's global scalars.

    Defaults follow ``init_args`` (``cuda_reference_RTM/src/fd-code.cu:367-377``):
    missing integer keys read as -1 and are then defaulted.
    """

    # grid size
    nz: int = -1
    nx: int = -1
    nt: int = -1
    dz: float = -1.0
    dx: float = -1.0
    dt: float = -1.0

    # acquisition geometry
    ns: int = 1          # number of sources
    sz: int = 0          # source depth (grid units, pre-border)
    fsx: int = 0         # first source x position
    ds: int = 1          # source x interval
    gz: int = 0          # receiver depth

    # boundary
    nxb: int = 40        # x border width
    nzb: int = 40        # z border width
    fac: float = 0.7     # taper damping factor

    # propagation
    order: int = 8       # FD order (even)
    fpeak: float = -1.0  # source peak frequency

    # aux
    iss: int = 0
    rnd: int = -1

    # file paths
    tmpdir: Optional[str] = None
    vpfile: Optional[str] = None
    datfile: Optional[str] = None
    vel_ext_file: Optional[str] = None

    @property
    def vel_ext_flag(self) -> bool:
        """True iff a pre-generated random-extended velocity file was given
        (parity path: ``fd-code.cu:367``)."""
        return self.vel_ext_file is not None

    @property
    def nze(self) -> int:
        return self.nz + 2 * self.nzb

    @property
    def nxe(self) -> int:
        return self.nx + 2 * self.nxb

    def geometry(self) -> "Geometry":
        return Geometry.from_params(self)

    def resolve_path(self, p: Optional[str], base: Optional[str] = None) -> Optional[str]:
        """Resolve a file path from the config.

        The reference fopen()s paths verbatim relative to the invocation cwd
        (each model's ``run.sh`` cd's first). Configs are inconsistent: 3lay's
        paths are relative to the input.dat directory while new_mod's are
        relative to the program root two levels up. We try, in order: relative
        to ``base``, verbatim (cwd), and ``base/../..``; first existing wins.
        """
        if p is None:
            return None
        if os.path.isabs(p) or base is None:
            return p
        candidates = [
            os.path.normpath(os.path.join(base, p)),
            p,
            os.path.normpath(os.path.join(base, "..", "..", p)),
        ]
        for c in candidates:
            if os.path.exists(c):
                return c
        return candidates[0]


@dataclasses.dataclass(frozen=True)
class Geometry:
    """Derived quantities: extended grid and border-shifted acquisition.

    Mirrors ``main`` at ``cuda_reference_RTM/src/fd-code.cu:405-411``:
    ``sx[is] = fsx + is*ds + nxb``, ``sz += nzb``, ``gz += nzb``.
    """

    nz: int
    nx: int
    nze: int
    nxe: int
    nt: int
    nzb: int
    nxb: int
    order: int
    sz: int            # source depth in extended grid
    gz: int            # receiver depth in extended grid
    sx: tuple          # per-shot source x in extended grid

    @staticmethod
    def from_params(p: Params) -> "Geometry":
        return Geometry(
            nz=p.nz, nx=p.nx, nze=p.nze, nxe=p.nxe, nt=p.nt,
            nzb=p.nzb, nxb=p.nxb, order=p.order,
            sz=p.sz + p.nzb, gz=p.gz + p.nzb,
            sx=tuple(p.fsx + i * p.ds + p.nxb for i in range(p.ns)),
        )


def _parse_line(line: str):
    line = line.strip()
    if not line or line.startswith("#") or "=" not in line:
        return None
    key, _, val = line.partition("=")
    return key.strip(), val.strip()


def parse_input_dat(path: str, base_dir: Optional[str] = None) -> Params:
    """Parse a reference ``input.dat`` file into :class:`Params`.

    Unknown keys (e.g. the ``norm_source``/``kernel`` strays in the marmousi
    configs) are ignored, matching the reference whose readers only look up
    known keys (``fd-code.cu:343-366``).
    """
    raw = {}
    with open(path, "r") as f:
        for line in f:
            kv = _parse_line(line)
            if kv is None:
                continue
            key, val = kv
            if key not in raw:  # first match wins, like the reference scan
                raw[key] = val

    p = Params()
    for k in _STR_KEYS:
        if k in raw and raw[k]:
            setattr(p, k, raw[k])
    for k in _INT_KEYS:
        if k in raw:
            try:
                setattr(p, k, int(float(raw[k])))
            except ValueError:
                pass
    for k in _FLOAT_KEYS:
        if k in raw:
            try:
                setattr(p, k, float(raw[k]))
            except ValueError:
                pass

    # init_args defaults for -1 sentinels (fd-code.cu:368-377)
    if p.iss == -1:
        p.iss = 0
    if p.ns == -1:
        p.ns = 1
    if p.sz == -1:
        p.sz = 0
    if p.fsx == -1:
        p.fsx = 0
    if p.ds == -1:
        p.ds = 1
    if p.gz == -1:
        p.gz = 0
    if p.order == -1:
        p.order = 8
    if p.nzb == -1:
        p.nzb = 40
    if p.nxb == -1:
        p.nxb = 40
    if p.fac == -1.0:
        p.fac = 0.7

    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(path))
    for k in ("vpfile", "datfile", "vel_ext_file"):
        v = getattr(p, k)
        if v is not None:
            setattr(p, k, p.resolve_path(v, base_dir))
    return p
