"""Fake-checkpoint parity for the speaker-cloning tower (VERDICT r2 task #3).

Mirrors tests/test_fake_checkpoint_parity.py for the voice-cloning stack: a
reference-keyed torch state dict (randomized weights AND randomized BatchNorm
running stats) is loaded into (a) a torch oracle module written from the
reference architecture — logFbankCal -> SimAM ResNet293 [10,20,64,3] -> ASP
-> 256-d bottleneck -> LDA 128 (zonos/speaker_cloning.py:12-223,387-411) —
and (b) our converter (models/speaker/convert.py) + JAX forward
(models/speaker/resnet.py).  Embeddings must match; a transposed or
misrouted conv in the converter fails these tests.

The torch oracle loads the state dict with strict=True, so the key schema of
the fake checkpoint is itself validated against torch Module conventions
("front.layer3.7.downsample.0.weight", "pooling.attention.2.running_mean",
...) — the same names the real `ResNet293_SimAM_ASP_base.pt` carries.

The mel frontend is compared against torchaudio when available (gated — not
installable here) and always against an independent torch.stft oracle
implementing torchaudio MelSpectrogram's documented semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

from zonos_tpu.models.speaker.convert import (  # noqa: E402
    convert_lda_state_dict,
    convert_speaker_state_dict,
)
from zonos_tpu.models.speaker.mel import log_mel_features, mel_filterbank  # noqa: E402
from zonos_tpu.models.speaker.resnet import (  # noqa: E402
    RESNET293_BLOCKS,
    speaker_embed_forward,
)


# ---------------------------------------------------------------------------
# Torch oracle: reference-semantics tower (zonos/speaker_cloning.py:37-223)
# ---------------------------------------------------------------------------


class _OracleBlock(nn.Module):
    """SimAM basic block (ref zonos/speaker_cloning.py:63-95)."""

    def __init__(self, cin: int, cout: int, stride: int):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, stride=1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = nn.Sequential()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False), nn.BatchNorm2d(cout)
            )

    @staticmethod
    def _simam(t: torch.Tensor, lambda_p: float = 1e-4) -> torch.Tensor:
        n = t.shape[2] * t.shape[3] - 1
        d = (t - t.mean(dim=[2, 3], keepdim=True)).pow(2)
        v = d.sum(dim=[2, 3], keepdim=True) / n
        return t * torch.sigmoid(d / (4 * (v + lambda_p)) + 0.5)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self._simam(self.bn2(self.conv2(h)))
        return torch.relu(h + self.downsample(x))


class _OracleFront(nn.Module):
    """ResNet stem + 4 stages (ref zonos/speaker_cloning.py:152-195)."""

    def __init__(self, in_planes: int, num_blocks):
        super().__init__()
        self.conv1 = nn.Conv2d(1, in_planes, 3, stride=1, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(in_planes)
        cin = in_planes
        for stage_idx, n in enumerate(num_blocks):
            cout = in_planes * 2**stage_idx
            blocks = []
            for b in range(n):
                stride = (1 if stage_idx == 0 else 2) if b == 0 else 1
                blocks.append(_OracleBlock(cin, cout, stride))
                cin = cout
            setattr(self, f"layer{stage_idx + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return x


class _OracleTower(nn.Module):
    """front + ASP + bottleneck (ref zonos/speaker_cloning.py:37-60,198-223)."""

    def __init__(self, in_planes: int, num_blocks, acoustic_dim: int, embd_dim: int):
        super().__init__()
        self.front = _OracleFront(in_planes, num_blocks)
        feat = in_planes * 8 * (acoustic_dim // 8)
        self.pooling = nn.Module()
        self.pooling.attention = nn.Sequential(
            nn.Conv1d(feat, 128, kernel_size=1),
            nn.ReLU(),
            nn.BatchNorm1d(128),
            nn.Conv1d(128, feat, kernel_size=1),
            nn.Softmax(dim=2),
        )
        self.bottleneck = nn.Linear(feat * 2, embd_dim)

    def forward(self, mel):  # mel [B, acoustic_dim, frames]
        fm = self.front(mel.unsqueeze(1))  # [B, C, H', W]
        flat = fm.reshape(fm.size(0), -1, fm.size(-1))  # [B, C*H', W]
        w = self.pooling.attention(flat)
        mu = torch.sum(flat * w, dim=2)
        sg = torch.sqrt((torch.sum(flat**2 * w, dim=2) - mu**2).clamp(min=1e-5))
        return self.bottleneck(torch.cat((mu, sg), 1))


def _randomize_(module: nn.Module, seed: int) -> None:
    """Random weights AND random (non-trivial) BN running stats, so the
    converter's stat folding is exercised — identity stats would hide a
    swapped mean/var."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.1
    module.load_state_dict(sd)


def _compare(tower: _OracleTower, mel: np.ndarray, atol: float) -> None:
    tower.eval()
    with torch.no_grad():
        want = tower(torch.from_numpy(mel)).numpy()
    params = convert_speaker_state_dict(tower.state_dict())
    got = np.asarray(speaker_embed_forward(params, mel))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=atol)


def test_small_tower_parity():
    """[2,2,2,2]-block tower: converter + JAX forward vs the torch oracle."""
    import zonos_tpu.models.speaker.convert as convert_mod

    tower = _OracleTower(in_planes=8, num_blocks=(2, 2, 2, 2), acoustic_dim=16, embd_dim=32)
    _randomize_(tower, seed=0)
    mel = np.random.default_rng(1).standard_normal((2, 16, 24)).astype(np.float32)
    orig = convert_mod.RESNET293_BLOCKS
    convert_mod.RESNET293_BLOCKS = (2, 2, 2, 2)
    try:
        _compare(tower, mel, atol=2e-4)
    finally:
        convert_mod.RESNET293_BLOCKS = orig


def test_full_resnet293_parity():
    """The real [10,20,64,3] SimAM ResNet293 + ASP + bottleneck layout — the
    exact shapes `ResNet293_SimAM_ASP_base.pt` carries (97 blocks, 80 mels,
    256-d embedding)."""
    tower = _OracleTower(in_planes=64, num_blocks=RESNET293_BLOCKS, acoustic_dim=80, embd_dim=256)
    _randomize_(tower, seed=2)
    mel = np.random.default_rng(3).standard_normal((1, 80, 24)).astype(np.float32)
    _compare(tower, mel, atol=5e-4)


def test_lda_head_parity():
    """LDA 256->128 fp32 linear head (ref zonos/speaker_cloning.py:387-411)."""
    g = torch.Generator().manual_seed(4)
    lda = nn.Linear(256, 128, bias=True)
    sd = {"weight": torch.randn((128, 256), generator=g),
          "bias": torch.randn((128,), generator=g)}
    lda.load_state_dict(sd)
    emb = np.random.default_rng(5).standard_normal((3, 256)).astype(np.float32)
    with torch.no_grad():
        want = lda(torch.from_numpy(emb)).numpy()
    p = convert_lda_state_dict(sd)
    got = emb @ p["w"] + p["b"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Mel frontend oracles
# ---------------------------------------------------------------------------


def _torch_stft_logmel(wav: np.ndarray) -> np.ndarray:
    """Independent mel oracle via torch.stft implementing torchaudio
    MelSpectrogram's documented defaults (hann window of win_length padded to
    n_fft, center=True reflect padding, power-2 magnitude, HTK filterbank
    with no normalization) + the tower's log/mean-norm
    (ref zonos/speaker_cloning.py:12-34)."""
    n_fft, win, hop, n_mels, sr = 512, 400, 160, 80, 16000
    x = torch.from_numpy(np.atleast_2d(wav).astype(np.float32))
    spec = torch.stft(
        x, n_fft=n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win, periodic=True),
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    ).abs() ** 2  # [B, n_fft//2+1, frames]
    fb = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels))
    mel = torch.einsum("bft,mf->bmt", spec, fb)
    out = torch.log(mel + 1e-6)
    return (out - out.mean(dim=2, keepdim=True)).numpy()


def test_mel_matches_torch_stft_oracle():
    rng = np.random.default_rng(6)
    wav = (rng.standard_normal((2, 16000)) * 0.3).astype(np.float32)
    got = log_mel_features(wav)
    want = _torch_stft_logmel(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mel_matches_torchaudio():
    """The authoritative oracle — runs where torchaudio is installed (the
    Docker image); asserts hann/center/reflect/HTK end to end."""
    torchaudio = pytest.importorskip("torchaudio")

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((1, 16000)) * 0.3).astype(np.float32)
    tf = torchaudio.transforms.MelSpectrogram(
        sample_rate=16000, n_fft=512, win_length=400, hop_length=160, n_mels=80
    )
    with torch.no_grad():
        mel = tf(torch.from_numpy(wav))
        want = torch.log(mel + 1e-6)
        want = (want - want.mean(dim=2, keepdim=True)).numpy()
    got = log_mel_features(wav)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_end_to_end_lda_embedding_parity():
    """Whole pipeline parity at 16 kHz input (no resample): our
    SpeakerEmbeddingLDA vs torch oracle fed the torch.stft mel."""
    import zonos_tpu.models.speaker.convert as convert_mod
    from zonos_tpu.models.speaker import SpeakerEmbeddingLDA

    tower = _OracleTower(in_planes=8, num_blocks=(2, 2, 2, 2), acoustic_dim=80, embd_dim=256)
    _randomize_(tower, seed=8)
    tower.eval()
    g = torch.Generator().manual_seed(9)
    lda_sd = {"weight": torch.randn((128, 256), generator=g) * 0.1,
              "bias": torch.randn((128,), generator=g) * 0.1}

    wav = (np.random.default_rng(10).standard_normal(8000) * 0.3).astype(np.float32)
    mel = torch.from_numpy(_torch_stft_logmel(wav))
    with torch.no_grad():
        emb_t = tower(mel).to(torch.float32)
        lda = nn.Linear(256, 128)
        lda.load_state_dict(lda_sd)
        want = lda(emb_t).numpy()

    orig = convert_mod.RESNET293_BLOCKS
    convert_mod.RESNET293_BLOCKS = (2, 2, 2, 2)
    try:
        params = convert_speaker_state_dict(tower.state_dict())
    finally:
        convert_mod.RESNET293_BLOCKS = orig
    ours = SpeakerEmbeddingLDA(params=params, lda=convert_lda_state_dict(lda_sd))
    _, got = ours(wav, 16000)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
