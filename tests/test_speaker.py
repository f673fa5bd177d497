"""Speaker-encoder parity: our JAX ResNet+SimAM+ASP+LDA with converted
weights vs an independent torch implementation of the same architecture
(executable spec of speaker_cloning.py:13-224, written from SURVEY.md §2.6).
Uses a shrunken config (width 8, depths 2/2/2/2) so it runs fast on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from zonos_vibes_tpu.models.speaker import SpeakerEncoder, convert_speaker_state_dict
from zonos_vibes_tpu.utils.dsp import log_fbank, mel_spectrogram, resample

IP, DEPTHS = 8, (2, 2, 2, 2)


class TorchSimAMBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = nn.Sequential()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        n = out.shape[2] * out.shape[3] - 1
        d = (out - out.mean(dim=[2, 3], keepdim=True)).pow(2)
        v = d.sum(dim=[2, 3], keepdim=True) / n
        out = out * torch.sigmoid(d / (4 * (v + 1e-4)) + 0.5)
        out = out + self.downsample(x)
        return F.relu(out)


class TorchSpeakerNet(nn.Module):
    def __init__(self, ip=IP, depths=DEPTHS, acoustic_dim=80, embd=32, lda=16):
        super().__init__()
        front = nn.Module()
        front.conv1 = nn.Conv2d(1, ip, 3, 1, 1, bias=False)
        front.bn1 = nn.BatchNorm2d(ip)

        def layer(cin, cout, depth, stride):
            blocks = [TorchSimAMBlock(cin, cout, stride)]
            blocks += [TorchSimAMBlock(cout, cout, 1) for _ in range(depth - 1)]
            return nn.Sequential(*blocks)

        front.layer1 = layer(ip, ip, depths[0], 1)
        front.layer2 = layer(ip, ip * 2, depths[1], 2)
        front.layer3 = layer(ip * 2, ip * 4, depths[2], 2)
        front.layer4 = layer(ip * 4, ip * 8, depths[3], 2)
        self.front = front
        C = ip * 8 * (acoustic_dim // 8)
        pooling = nn.Module()
        pooling.attention = nn.Sequential(
            nn.Conv1d(C, 128, 1), nn.ReLU(), nn.BatchNorm1d(128),
            nn.Conv1d(128, C, 1), nn.Softmax(dim=2),
        )
        self.pooling = pooling
        self.bottleneck = nn.Linear(C * 2, embd)

    def forward(self, mel):  # [B, 80, T]
        x = mel.unsqueeze(1)
        f = self.front
        x = F.relu(f.bn1(f.conv1(x)))
        x = f.layer4(f.layer3(f.layer2(f.layer1(x))))
        x = x.reshape(x.size(0), -1, x.size(-1))
        w = self.pooling.attention(x)
        mu = torch.sum(x * w, dim=2)
        sg = torch.sqrt((torch.sum(x**2 * w, dim=2) - mu**2).clamp(min=1e-5))
        return self.bottleneck(torch.cat([mu, sg], dim=1))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tnet = TorchSpeakerNet().eval()
    # Randomize BN running stats so folding is actually exercised.
    for m in tnet.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.6, 1.5)
    lda = nn.Linear(32, 16)
    enc = SpeakerEncoder(in_planes=IP, embd_dim=32, lda_dim=16, depths=DEPTHS)
    params = convert_speaker_state_dict(
        tnet.state_dict(), lda.state_dict(), jnp.float32, depths=DEPTHS
    )
    return tnet, lda, enc, params


def test_embedding_parity(pair):
    tnet, lda, enc, params = pair
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 50)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(mel))
        ref_lda = lda(ref).numpy()
        ref = ref.numpy()
    emb = np.asarray(enc.embed(params, jnp.asarray(mel)))
    np.testing.assert_allclose(emb, ref, rtol=1e-3, atol=1e-4)
    lda_out = emb @ np.asarray(params["lda"]["weight"]) + np.asarray(params["lda"]["bias"])
    np.testing.assert_allclose(lda_out, ref_lda, rtol=1e-3, atol=1e-4)


def test_full_call_runs(pair):
    _, _, enc, params = pair
    wav = np.random.default_rng(1).standard_normal((2, 24000)).astype(np.float32)
    emb, lda_emb = enc(params, jnp.asarray(wav), 24000)
    assert emb.shape == (1, 32) and lda_emb.shape == (1, 16)


def test_mel_spectrogram_properties():
    """Sanity of the mel frontend: shapes, energy localization."""
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 1000.0 * t)  # 1 kHz
    mel = np.asarray(mel_spectrogram(jnp.asarray(tone[None, :])))
    assert mel.shape[1] == 80
    # center=True: frames = T // hop + 1
    assert mel.shape[2] == sr // 160 + 1
    peak_bin = mel.mean(-1).argmax()
    # 1 kHz in HTK mel with fmax=8k lands around bin 30 of 80.
    assert 20 < peak_bin < 45
    lf = np.asarray(log_fbank(jnp.asarray(tone[None, :])))
    np.testing.assert_allclose(lf.mean(-1), 0.0, atol=1e-4)


def test_resample_tone_preserved():
    """Windowed-sinc resample keeps an in-band tone's frequency and energy."""
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in, dtype=np.float32) / sr_in
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    out = np.asarray(resample(jnp.asarray(tone[None, :]), sr_in, sr_out))[0]
    assert abs(out.shape[0] - sr_out) <= 1
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = spec.argmax() * sr_out / len(out)
    assert abs(peak_hz - 440.0) < 2.0
    # Amplitude preserved within a few percent mid-band.
    assert 0.9 < out[1000:-1000].max() < 1.1


def test_resample_identity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 100)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(resample(x, 16000, 16000)), np.asarray(x))
