"""DAC codec tests: numerical parity vs the torch DacModel (random weights,
converted through the state-dict converter) plus round-trip/shape checks.

The real descript/dac_44khz checkpoint is not available in the air-gapped
test env; parity on a randomly initialized model exercises identical math
(convs, snake, RVQ) end to end, which is what checkpoint parity needs.
"""

import numpy as np
import pytest

from zonos_tpu.models.dac.codec import (
    DACConfig,
    dac_decode,
    dac_encode,
    dac_encode_latents,
    init_dac_params,
    rvq_decode,
    rvq_encode,
)

TINY = DACConfig(
    encoder_hidden_size=8,
    downsampling_ratios=(2, 4),
    decoder_hidden_size=32,
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
)


def _torch_tiny_model():
    torch = pytest.importorskip("torch")
    from transformers.models.dac import DacConfig as HFDacConfig, DacModel

    hf_cfg = HFDacConfig(
        encoder_hidden_size=TINY.encoder_hidden_size,
        downsampling_ratios=list(TINY.downsampling_ratios),
        decoder_hidden_size=TINY.decoder_hidden_size,
        n_codebooks=TINY.n_codebooks,
        codebook_size=TINY.codebook_size,
        codebook_dim=TINY.codebook_dim,
        sampling_rate=44100,
    )
    torch.manual_seed(0)
    model = DacModel(hf_cfg).eval()
    return torch, model


@pytest.fixture(scope="module")
def torch_and_params():
    torch, model = _torch_tiny_model()
    from zonos_tpu.models.dac.convert import convert_dac_state_dict

    params = convert_dac_state_dict(model.state_dict(), TINY)
    return torch, model, params


def test_encoder_latents_match_torch(torch_and_params):
    torch, model, params = torch_and_params
    rng = np.random.default_rng(0)
    T = TINY.hop_length * 6
    audio = rng.normal(size=(2, 1, T)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = model.encoder(torch.from_numpy(audio)).numpy()  # [B, H, T']
    got = np.asarray(dac_encode_latents(params, TINY, audio.transpose(0, 2, 1)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


def test_codes_match_torch(torch_and_params):
    torch, model, params = torch_and_params
    rng = np.random.default_rng(1)
    audio = rng.normal(size=(1, 1, TINY.hop_length * 8)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_codes = model.encode(torch.from_numpy(audio)).audio_codes.numpy()
    got_codes = np.asarray(dac_encode(params, TINY, audio.transpose(0, 2, 1)))
    np.testing.assert_array_equal(got_codes, ref_codes)


def test_decode_matches_torch(torch_and_params):
    torch, model, params = torch_and_params
    rng = np.random.default_rng(2)
    codes = rng.integers(0, TINY.codebook_size, size=(1, TINY.n_codebooks, 7))
    with torch.no_grad():
        ref = model.decode(audio_codes=torch.from_numpy(codes)).audio_values.numpy()
    got = np.asarray(dac_decode(params, TINY, codes))[..., 0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_rvq_shapes_and_determinism():
    import jax

    params = init_dac_params(jax.random.key(0), TINY)
    rng = np.random.default_rng(3)
    codes = rng.integers(0, TINY.codebook_size, size=(2, TINY.n_codebooks, 9))
    lat = rvq_decode(params, codes)
    assert lat.shape == (2, 9, TINY.hidden_size)
    codes2 = np.asarray(rvq_encode(params, lat))
    assert codes2.shape == codes.shape
    np.testing.assert_array_equal(codes2, np.asarray(rvq_encode(params, lat)))


def test_full_config_shapes():
    """44 kHz config: hop 512, latent 1024, 9 codebooks (ref values)."""
    cfg = DACConfig()
    assert cfg.hop_length == 512
    assert cfg.hidden_size == 1024
    assert cfg.n_codebooks == 9
    assert cfg.sampling_rate == 44100


def test_wrapper_decode_shapes():
    from zonos_tpu.models.dac import DACAutoencoder

    import jax

    ae = DACAutoencoder(params=init_dac_params(jax.random.key(0), TINY), cfg=TINY)
    codes = np.zeros((1, TINY.n_codebooks, 5), np.int32)
    wav = ae.decode(codes)
    assert wav.shape == (1, 1, 5 * TINY.hop_length)
    wavs = ae.codes_to_wavs(codes)
    assert len(wavs) == 1 and wavs[0].shape[0] == 1


def test_decoder_receptive_field_bound():
    """The analytic receptive-field bound (decoder_receptive_field_frames)
    must cover the decoder's EMPIRICAL support: perturbing one code frame
    changes no sample further than `bound` frames away, and the support is
    genuinely wide (> 6 frames), so streaming margins below the bound are
    unsound.  Measured on the 44.1 kHz config: support reaches 10.11
    frames; bound = 12 (see codec.py derivation)."""
    import jax
    from zonos_tpu.models.dac.codec import decoder_receptive_field_frames

    cfg = DACConfig()
    bound = decoder_receptive_field_frames(cfg)
    assert bound == 12
    params = init_dac_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    T, t = 40, 20
    codes = rng.integers(0, cfg.codebook_size, size=(1, cfg.n_codebooks, T))
    base = np.asarray(dac_decode(params, cfg, codes))[0, :, 0]
    pert = codes.copy()
    pert[:, :, t] = (pert[:, :, t] + 7) % cfg.codebook_size
    diff = np.abs(base - np.asarray(dac_decode(params, cfg, pert))[0, :, 0])
    nz = np.nonzero(diff > 1e-9)[0]
    left = t - nz.min() / cfg.hop_length
    right = nz.max() / cfg.hop_length - t
    assert max(left, right) <= bound, (left, right, bound)
    assert max(left, right) > 6  # the bound is not vacuous
