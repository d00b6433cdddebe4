"""Boundary-MPS cache (placeholder — full implementation in progress)."""


class BoundaryMPSCache:
    def __init__(self, *a, **k):
        raise NotImplementedError("BoundaryMPSCache implementation in progress")


def expect_boundarymps(*a, **k):
    raise NotImplementedError


def norm_sqr_boundarymps(*a, **k):
    raise NotImplementedError


def inner_boundarymps(*a, **k):
    raise NotImplementedError


def rdm_boundarymps(*a, **k):
    raise NotImplementedError


def contract_boundarymps(*a, **k):
    raise NotImplementedError
