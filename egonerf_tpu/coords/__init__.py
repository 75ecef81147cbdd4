"""Coordinate-system registry (reference: models/__init__.py:5-15)."""
from .base import Coordinates
from .cartesian import CartesianCoords
from .spherical import (
    BalancedSphericalCoords,
    CylindricalCoords,
    DirectionalBalancedSphericalCoords,
    DirectionalSphericalCoords,
    EulerSphericalCoords,
    GenericSphericalCoords,
    SphericalCoords,
)
from .yinyang import YinYangSphericalCoords

coordinates_dict = {
    "xyz": CartesianCoords,
    "sphere": SphericalCoords,
    "balanced_sphere": BalancedSphericalCoords,
    "directional_sphere": DirectionalSphericalCoords,
    "directional_balanced_sphere": DirectionalBalancedSphericalCoords,
    "cylinder": CylindricalCoords,
    "euler_sphere": EulerSphericalCoords,
    "yinyang": YinYangSphericalCoords,
    "generic_sphere": GenericSphericalCoords,
}


def make_coordinates(name: str, aabb, exp_r=False, N_voxel=None, r0=None, interval_th=False):
    """Construct a coordinate system the way the training driver does
    (reference: train.py:118-130)."""
    cls = coordinates_dict[name]
    if name in ("yinyang", "generic_sphere"):
        coords = cls(aabb, exp_r=exp_r, N_voxel=N_voxel, r0=r0, interval_th=interval_th)
    else:
        coords = cls(aabb)
    return coords


def coords_from_spec(spec: dict):
    """Rebuild a coordinate system from its checkpoint spec."""
    spec = dict(spec)
    name = spec.pop("name")
    resolution = spec.pop("resolution", None)
    aabb = spec.pop("aabb")
    coords = make_coordinates(
        name,
        aabb,
        exp_r=spec.get("exp_r", False),
        r0=spec.get("r0"),
        interval_th=spec.get("interval_th", False),
    )
    if resolution is not None:
        if name in ("yinyang", "generic_sphere"):
            coords.set_resolution(resolution, r0=spec.get("r0"))
        else:
            Coordinates.set_resolution(coords, resolution)
    # the balanced charts derive ratio/r0/coeff in N_to_reso; restore them
    for key in ("ratio", "r0", "coeff"):
        if key in spec and hasattr(coords, key) and spec[key] is not None:
            setattr(coords, key, spec[key])
    return coords
