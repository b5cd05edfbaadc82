"""Manifold state spaces (reference: include/aligator/core/manifold-base.hpp
+ modelling/spaces/)."""

from aligator_tpu.manifolds.base import Manifold
from aligator_tpu.manifolds.vector import VectorSpace
from aligator_tpu.manifolds.lie import SO2, SO3, SE2, SE3
from aligator_tpu.manifolds.product import CartesianProduct
from aligator_tpu.manifolds.tangent import TangentBundle

# alias matching the reference binding name (expose-manifold.cpp)
EuclideanSpace = VectorSpace

__all__ = [
    "Manifold",
    "VectorSpace",
    "EuclideanSpace",
    "SO2",
    "SO3",
    "SE2",
    "SE3",
    "CartesianProduct",
    "TangentBundle",
]
