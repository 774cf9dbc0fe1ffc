"""Alchemical (legacy=False) SOAP-BPNN torch-checkpoint import.

The reference ships no alchemical checkpoint in its corpus, so the
fixture is SYNTHESIZED in the reference's own state-dict layout
(``soap_bpnn/model.py:229-312``: spex Alchemical species contraction,
``center_encoding`` embedding, shared ``layernorm_for_tensors``, shared
bias-free ``bpnn_for_tensors`` Sequential, single-key ``last_layers``)
and the imported model is validated against an INDEPENDENT numpy
re-implementation of that forward written directly from the reference
code -- not against the importer's own machinery."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import make_molecule


N_SPECIES = 2  # types (1, 6)
N_PSEUDO = 3
MAX_ANGULAR = 1
N_PER_L = (2, 1)  # spline columns: 3
NEURONS = 8
CUTOFF = 4.0
WIDTH = 0.5


def _spline_tables(n_cols, n_knots=40, r_hi=6.0, seed=0):
    rng = np.random.default_rng(seed)
    spacing = r_hi / (n_knots - 1)
    values = rng.normal(size=(n_knots, n_cols))
    derivs = rng.normal(size=(n_knots, n_cols))
    return values, derivs, spacing


def _make_state(rng):
    soap_size = sum(
        (n * N_PSEUDO) ** 2 for n in N_PER_L
    )
    values, derivs, spacing = _spline_tables(sum(N_PER_L))
    state = {
        "soap_calculator.calculator.radial.spliner.spline_values": values,
        "soap_calculator.calculator.radial.spliner.spline_derivatives": derivs,
        "soap_calculator.calculator.radial.spliner.spline_spacing": np.asarray(
            spacing
        ),
        # spex Alchemical species contraction, torch Linear layout
        # (pseudo, species)
        "soap_calculator.calculator.species.combination_matrix.weight": (
            rng.normal(size=(N_PSEUDO, N_SPECIES))
        ),
        "center_encoding.weight": rng.normal(size=(N_SPECIES, soap_size)),
        "layernorm_for_tensors.weight": rng.normal(size=(soap_size,)) + 1.0,
        "layernorm_for_tensors.bias": rng.normal(size=(soap_size,)),
        # Sequential [Linear, SiLU, Linear, SiLU] -> Linear ids 0, 2
        "bpnn_for_tensors.0.weight": rng.normal(
            size=(NEURONS, soap_size)
        ) / np.sqrt(soap_size),
        "bpnn_for_tensors.2.weight": rng.normal(
            size=(NEURONS, NEURONS)
        ) / np.sqrt(NEURONS),
        "last_layers.energy.energy.module_map.module_list.0.weight": (
            rng.normal(size=(1, NEURONS))
        ),
    }
    return state, soap_size


def _make_ckpt(rng):
    state, soap_size = _make_state(rng)

    from metatrain_tpu.data.target_info import (
        DatasetInfo,
        get_energy_target_info,
    )

    di = DatasetInfo(
        "angstrom",
        [1, 6],
        {"energy": get_energy_target_info("eV", add_position_gradients=True)},
    )
    return {
        "architecture_name": "soap_bpnn",
        "model_ckpt_version": 9,
        "model_data": {
            "model_hypers": {
                "legacy": False,
                "soap": {
                    "max_angular": MAX_ANGULAR,
                    "max_radial": max(N_PER_L),
                    "cutoff": {"radius": CUTOFF, "width": WIDTH},
                },
                "bpnn": {
                    "layernorm": True,
                    "num_hidden_layers": 2,
                    "num_neurons_per_layer": NEURONS,
                },
                "heads": {},
            },
            "dataset_info": di,
        },
        "model_state_dict": state,
    }


def _reference_forward_numpy(state, system, species):
    """Reference modern forward re-implemented from
    ``soap_bpnn/model.py:520-620`` + ``modules/power_spectrum.py:117-140``
    in plain numpy (spline eval + SH from our ops -- the descriptor
    conventions under test are the CONTRACTION layout, encoding, shared
    norm/MLP and last layers)."""
    from metatrain_tpu.ops.neighbors import compute_neighbor_data
    from metatrain_tpu.ops.radial import cosine_cutoff, hermite_spline_basis
    from metatrain_tpu.ops.spherical import real_spherical_harmonics

    nbr = compute_neighbor_data(system, cutoff=CUTOFF)
    A = len(system)
    comb = np.asarray(
        state["soap_calculator.calculator.species.combination_matrix.weight"],
        np.float64,
    )  # (pseudo, species)
    sp_index = np.searchsorted(species, np.asarray(system.types))

    # edge vectors from the neighbor data
    idx = np.asarray(nbr.indices)
    mask = np.asarray(nbr.mask)
    shifts = np.asarray(nbr.shifts)
    pos = np.asarray(system.positions)
    cell = np.asarray(system.cell)
    vec = pos[idx] - pos[:, None, :] + shifts @ cell
    dist = np.linalg.norm(np.where(mask[:, :, None], vec, 1.0), axis=-1)

    rb = np.asarray(
        hermite_spline_basis(
            jnp.asarray(dist),
            jnp.asarray(
                state[
                    "soap_calculator.calculator.radial.spliner.spline_values"
                ]
            ),
            jnp.asarray(
                state[
                    "soap_calculator.calculator.radial.spliner"
                    ".spline_derivatives"
                ]
            ),
            float(
                state[
                    "soap_calculator.calculator.radial.spliner.spline_spacing"
                ]
            ),
        ),
        np.float64,
    )
    rb = rb * np.asarray(
        cosine_cutoff(jnp.asarray(dist), CUTOFF, WIDTH), np.float64
    )[:, :, None]
    rb = np.where(mask[:, :, None], rb, 0.0)

    unit = vec / np.maximum(dist, 1e-10)[:, :, None]
    sph = np.concatenate(
        [
            np.asarray(b, np.float64)
            for b in real_spherical_harmonics(jnp.asarray(unit), MAX_ANGULAR)
        ],
        axis=-1,
    )
    sph = np.where(mask[:, :, None], sph, 0.0)

    # pseudo-species weights of each neighbor
    w = comb.T[sp_index[idx]]  # (A, M, pseudo)

    # per-l coefficients + full-square power spectrum, (pseudo, n)-major
    feats = []
    off_n, off_m = 0, 0
    for l, n_l in enumerate(N_PER_L):
        r_l = rb[:, :, off_n : off_n + n_l]
        s_l = sph[:, :, off_m : off_m + 2 * l + 1]
        chan = (w[:, :, :, None] * r_l[:, :, None, :]).reshape(
            A, r_l.shape[1], -1
        )
        c_l = np.einsum("amc,aml->acl", chan, s_l)
        p_l = np.einsum("acm,adm->acd", c_l, c_l)
        feats.append(p_l.reshape(A, -1))
        off_n += n_l
        off_m += 2 * l + 1
    feats = np.concatenate(feats, axis=1)

    # center encoding -> shared layernorm -> shared MLP -> last layer
    feats = feats * np.asarray(state["center_encoding.weight"], np.float64)[
        sp_index
    ]
    mean = feats.mean(axis=-1, keepdims=True)
    var = feats.var(axis=-1, keepdims=True)
    feats = (feats - mean) / np.sqrt(var + 1e-5)
    feats = feats * np.asarray(
        state["layernorm_for_tensors.weight"], np.float64
    ) + np.asarray(state["layernorm_for_tensors.bias"], np.float64)

    def silu(x):
        return x / (1.0 + np.exp(-x))

    h = silu(feats @ np.asarray(state["bpnn_for_tensors.0.weight"]).T)
    h = silu(h @ np.asarray(state["bpnn_for_tensors.2.weight"]).T)
    per_atom = h @ np.asarray(
        state["last_layers.energy.energy.module_map.module_list.0.weight"]
    ).T
    return float(per_atom.sum())


def test_alchemical_import_matches_independent_reference():
    rng = np.random.default_rng(42)
    ckpt = _make_ckpt(rng)

    from metatrain_tpu.interop.soap_bpnn_import import (
        convert_soap_bpnn_checkpoint,
    )
    from metatrain_tpu.utils.io import model_from_checkpoint

    out = convert_soap_bpnn_checkpoint(ckpt)
    assert out["hypers"]["legacy"] is False
    assert out["hypers"]["num_pseudo_species"] == N_PSEUDO
    assert out["unmapped_tensors"] == []

    model = model_from_checkpoint(out, context="export")

    from metatrain_tpu.containers import batch_from_systems
    from metatrain_tpu.ops.neighbors import compute_neighbor_data

    system = make_molecule(6, seed=7, types=(1, 6))
    nbr = compute_neighbor_data(system, cutoff=CUTOFF)
    batch = batch_from_systems([system], [nbr], dtype=jnp.float64)
    pred = model.forward(model.params, batch, ["energy"])["energy"].block(0)
    ours = float(np.asarray(pred.values).sum())

    expected = _reference_forward_numpy(
        ckpt["model_state_dict"], system, np.asarray([1, 6])
    )
    np.testing.assert_allclose(ours, expected, rtol=5e-5, atol=1e-7)


def test_square_contraction_matrix_refused():
    rng = np.random.default_rng(1)
    ckpt = _make_ckpt(rng)
    ckpt["model_state_dict"][
        "soap_calculator.calculator.species.combination_matrix.weight"
    ] = rng.normal(size=(N_SPECIES, N_SPECIES))
    from metatrain_tpu.interop.soap_bpnn_import import (
        convert_soap_bpnn_checkpoint,
    )

    with pytest.raises(ValueError, match="orientation-ambiguous"):
        convert_soap_bpnn_checkpoint(ckpt)
