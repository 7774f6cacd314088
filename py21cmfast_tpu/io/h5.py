"""Versioned HDF5 read/write of output boxes.

Equivalent of reference io/h5.py:70-428: each output pytree is one HDF5 file
with array leaves as datasets and the full InputParameters serialized into
attrs, so any box is reproducible from its file alone.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import h5py
import numpy as np

from .. import outputs as outputs_module
from ..input_serialization import deserialize_inputs, serialize_inputs

FORMAT_VERSION = "py21cmfast_tpu:1"

_OUTPUT_CLASSES = {
    cls.__name__: cls
    for cls in (
        outputs_module.InitialConditions,
        outputs_module.PerturbedField,
        outputs_module.IonizedBox,
        outputs_module.TsBox,
        outputs_module.BrightnessTemp,
        outputs_module.HaloBox,
        outputs_module.XraySourceBox,
        outputs_module.HaloCatalog,
        outputs_module.PerturbedHaloCatalog,
    )
}


def write_output_to_hdf5(output, path, inputs=None, extra_attrs=None):
    """Write one output pytree to an HDF5 file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["format_version"] = FORMAT_VERSION
        f.attrs["output_class"] = type(output).__name__
        if inputs is not None:
            f.attrs["inputs"] = json.dumps(serialize_inputs(inputs))
        for k, v in (extra_attrs or {}).items():
            f.attrs[k] = v
        grp = f.create_group(type(output).__name__)
        for field in dataclasses.fields(output):
            val = getattr(output, field.name)
            if val is None:
                continue
            arr = np.asarray(val)
            if arr.ndim == 0:
                grp.attrs[field.name] = float(arr)
            else:
                grp.create_dataset(field.name, data=arr, compression="gzip" if arr.ndim >= 3 else None)
    return path


def read_output_from_hdf5(path, cls=None):
    """Read an output pytree (numpy leaves) + its InputParameters (or None)."""
    path = Path(path)
    with h5py.File(path, "r") as f:
        cls_name = f.attrs["output_class"]
        if cls is None:
            cls = _OUTPUT_CLASSES[cls_name]
        elif cls.__name__ != cls_name:
            raise ValueError(f"file holds {cls_name}, requested {cls.__name__}")
        grp = f[cls_name]
        kwargs = {}
        for field in dataclasses.fields(cls):
            if field.name in grp:
                kwargs[field.name] = grp[field.name][...]
            elif field.name in grp.attrs:
                kwargs[field.name] = np.float32(grp.attrs[field.name])
        inputs = None
        if "inputs" in f.attrs:
            inputs = deserialize_inputs(json.loads(f.attrs["inputs"]))
    return cls(**kwargs), inputs


def read_output_struct(path, struct=None):
    """Read one output box from an HDF5 file (reference io/h5.py:338
    `read_output_struct`): returns the struct alone."""
    box, _inputs = read_output_from_hdf5(path, cls=struct)
    return box


def read_inputs(path):
    """Read the InputParameters stored in an output HDF5 file (reference
    io/h5.py:384 `read_inputs`)."""
    path = Path(path)
    with h5py.File(path, "r") as f:
        if "inputs" not in f.attrs:
            raise KeyError(f"{path} stores no InputParameters")
        return deserialize_inputs(json.loads(f.attrs["inputs"]))
