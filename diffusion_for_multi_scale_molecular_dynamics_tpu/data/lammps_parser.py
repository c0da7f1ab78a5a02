"""LAMMPS output parsing: native C++ fast path with a pure-Python fallback.

Dump files (yaml, one document per MD step) are parsed by the C++ extension
in native/lammps_dump_parser.cpp (built on first use with g++, cached next to
the source); the thermo log is small and parsed with PyYAML either way.

Functional parity with the reference's parser
(src/diffusion_for_multi_scale_molecular_dynamics/data/parse_lammps_outputs.py:12-139),
returning numpy arrays instead of ragged dataframe cells. Atoms are sorted by
LAMMPS id per step.
"""

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, NamedTuple

import numpy as np
import yaml

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SOURCE = os.path.join(_NATIVE_DIR, "lammps_dump_parser.cpp")
_LIBRARY = os.path.join(_NATIVE_DIR, "liblammps_dump_parser.so")

_lib = None
_native_disabled = False


class LammpsDump(NamedTuple):
    """Parsed dump: trajectories over MD steps (atoms sorted by id)."""

    boxes: np.ndarray  # [n_steps, 3] box lengths
    positions: np.ndarray  # [n_steps, natoms, 3]
    forces: np.ndarray  # [n_steps, natoms, 3]
    elements: List[List[str]]  # per step, per atom element names
    atom_ids: np.ndarray  # [n_steps, natoms]


class _CDumpData(ctypes.Structure):
    _fields_ = [
        ("n_steps", ctypes.c_int64),
        ("natoms", ctypes.c_int64),
        ("n_elements", ctypes.c_int64),
        ("boxes", ctypes.POINTER(ctypes.c_double)),
        ("positions", ctypes.POINTER(ctypes.c_double)),
        ("forces", ctypes.POINTER(ctypes.c_double)),
        ("element_ids", ctypes.POINTER(ctypes.c_int32)),
        ("atom_ids", ctypes.POINTER(ctypes.c_int64)),
        ("element_table", ctypes.c_char_p),
        ("element_table_size", ctypes.c_int64),
    ]


def _build_native_library() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SOURCE,
                "-o",
                _LIBRARY,
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as exc:
        logger.warning("native dump parser build failed (%s); using python fallback", exc)
        return False


def _get_native_library():
    global _lib, _native_disabled
    if _lib is not None or _native_disabled:
        return _lib
    if not os.path.exists(_LIBRARY) or os.path.getmtime(_LIBRARY) < os.path.getmtime(
        _SOURCE
    ):
        if not _build_native_library():
            _native_disabled = True
            return None
    lib = ctypes.CDLL(_LIBRARY)
    lib.parse_lammps_dump_file.restype = ctypes.POINTER(_CDumpData)
    lib.parse_lammps_dump_file.argtypes = [ctypes.c_char_p]
    lib.dump_data_error.restype = ctypes.c_char_p
    lib.free_dump_data.argtypes = [ctypes.POINTER(_CDumpData)]
    _lib = lib
    return _lib


def _parse_dump_native(path: str) -> LammpsDump:
    lib = _get_native_library()
    result = lib.parse_lammps_dump_file(path.encode())
    if not result:
        raise ValueError(
            f"native dump parse of {path} failed: "
            f"{lib.dump_data_error().decode()}"
        )
    try:
        d = result.contents
        n_steps, natoms = d.n_steps, d.natoms
        boxes = np.ctypeslib.as_array(d.boxes, shape=(n_steps, 3)).copy()
        positions = np.ctypeslib.as_array(
            d.positions, shape=(n_steps, natoms, 3)
        ).copy()
        forces = np.ctypeslib.as_array(d.forces, shape=(n_steps, natoms, 3)).copy()
        element_ids = np.ctypeslib.as_array(
            d.element_ids, shape=(n_steps, natoms)
        ).copy()
        atom_ids = np.ctypeslib.as_array(d.atom_ids, shape=(n_steps, natoms)).copy()
        raw_table = ctypes.string_at(d.element_table, d.element_table_size)
        names = raw_table.decode().split("\x00")[: d.n_elements]
    finally:
        lib.free_dump_data(result)
    elements = [[names[i] for i in step] for step in element_ids]
    return LammpsDump(boxes, positions, forces, elements, atom_ids)


def _parse_dump_python(path: str) -> LammpsDump:
    try:
        from yaml import CSafeLoader as Loader
    except ImportError:
        from yaml import SafeLoader as Loader

    boxes, positions, forces, elements, atom_ids = [], [], [], [], []
    with open(path, "r") as stream:
        for doc in yaml.load_all(stream, Loader=Loader):
            keywords = doc["keywords"]
            assert keywords == ["id", "element", "x", "y", "z", "fx", "fy", "fz"], (
                f"unexpected dump keywords {keywords}"
            )
            box = np.asarray(doc["box"], dtype=np.float64)
            boxes.append(box[:, 1] - box[:, 0])
            rows = sorted(doc["data"], key=lambda r: r[0])
            atom_ids.append([r[0] for r in rows])
            elements.append([r[1] for r in rows])
            positions.append([r[2:5] for r in rows])
            forces.append([r[5:8] for r in rows])
    return LammpsDump(
        np.asarray(boxes),
        np.asarray(positions, dtype=np.float64),
        np.asarray(forces, dtype=np.float64),
        elements,
        np.asarray(atom_ids),
    )


def parse_lammps_dump(path: str, use_native: bool = True) -> LammpsDump:
    """Parse a LAMMPS yaml dump file into trajectory arrays."""
    if not os.path.exists(path):
        raise ValueError(f"{path} does not exist; provide a valid yaml dump file.")
    if use_native and _get_native_library() is not None:
        return _parse_dump_native(path)
    return _parse_dump_python(path)


def parse_lammps_thermo_log(path: str) -> Dict[str, List[float]]:
    """Parse the thermo yaml log into energies (and optional P/T columns)."""
    if not os.path.exists(path):
        raise ValueError(f"{path} does not exist; provide a valid thermo log.")
    with open(path, "r") as fh:
        log = yaml.safe_load(fh)
    keywords = log["keywords"]
    kin_idx = keywords.index("KinEng")
    pot_idx = keywords.index("PotEng")
    optional = {"Press": "pressure", "Temp": "temperature"}
    optional_idx = {
        name: keywords.index(key) for key, name in optional.items() if key in keywords
    }

    out: Dict[str, List[float]] = {
        "potential_energy": [],
        "kinetic_energy": [],
        "energy": [],
    }
    for name in optional_idx:
        out[name] = []
    for record in log["data"]:
        pot, kin = record[pot_idx], record[kin_idx]
        out["potential_energy"].append(pot)
        out["kinetic_energy"].append(kin)
        out["energy"].append(pot + kin)
        for name, idx in optional_idx.items():
            out[name].append(record[idx])
    return out
