// zvt_dsp: native host-side audio DSP for the serving path.
//
// The reference's host DSP is native C++ (torchaudio's resample/mel ops,
// SURVEY.md §2.9 N8); this library is the TPU build's equivalent for the
// CPU preprocessing tier: speaker-reference audio arrives over HTTP, gets
// resampled to 16 kHz and mel-analyzed here without touching the
// accelerator or paying a JAX dispatch, then only the small mel tensor is
// shipped to the device.
//
// Algorithms match zonos_vibes_tpu/utils/dsp.py bit-for-bit in spirit
// (same windowed-sinc polyphase construction, same HTK mel filterbank,
// same centered reflect-padded 512-point STFT) so the Python and native
// tiers are interchangeable; tests cross-check them.
//
// Build: make -C native   (produces libzvt_dsp.so; ctypes binding in
// zonos_vibes_tpu/frontend/native_dsp.py)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

int64_t gcd64(int64_t a, int64_t b) { return b == 0 ? a : gcd64(b, a % b); }

// Windowed-sinc polyphase kernel (torchaudio sinc_interp_hann semantics:
// rolloff 0.99, lowpass_filter_width 6, hann^2 window).
struct ResampleKernel {
  int orig_freq, new_freq, width;
  std::vector<float> taps;  // [new_freq][width*2 + orig_freq]
  int taps_per_phase;
};

ResampleKernel build_kernel(int orig_sr, int new_sr) {
  const double rolloff = 0.99;
  const int lowpass_width = 6;
  int64_t g = gcd64(orig_sr, new_sr);
  int orig = static_cast<int>(orig_sr / g), fresh = static_cast<int>(new_sr / g);
  double base_freq = std::min(orig, fresh) * rolloff;
  int width = static_cast<int>(std::ceil(lowpass_width * orig / base_freq));
  int n_taps = 2 * width + orig;
  ResampleKernel k{orig, fresh, width, {}, n_taps};
  k.taps.resize(static_cast<size_t>(fresh) * n_taps);
  for (int p = 0; p < fresh; ++p) {
    for (int j = 0; j < n_taps; ++j) {
      double idx = static_cast<double>(j - width) / orig;
      double t = (idx - static_cast<double>(p) / fresh) * base_freq;
      t = std::max(-(double)lowpass_width, std::min((double)lowpass_width, t));
      double window = std::cos(t * kPi / lowpass_width / 2.0);
      window *= window;
      double tp = t * kPi;
      double sinc = (t == 0.0) ? 1.0 : std::sin(tp) / tp;
      k.taps[static_cast<size_t>(p) * n_taps + j] =
          static_cast<float>(sinc * window * base_freq / orig);
    }
  }
  return k;
}

}  // namespace

extern "C" {

// Output length for resample (ceil(new * len / orig) after gcd reduction).
int64_t zvt_resample_out_len(int64_t in_len, int orig_sr, int new_sr) {
  int64_t g = gcd64(orig_sr, new_sr);
  int64_t orig = orig_sr / g, fresh = new_sr / g;
  return (fresh * in_len + orig - 1) / orig;
}

// Polyphase windowed-sinc resample, mono float32. Returns samples written.
int64_t zvt_resample_f32(const float* in, int64_t in_len, int orig_sr,
                         int new_sr, float* out, int64_t out_cap) {
  if (orig_sr == new_sr) {
    int64_t n = std::min(in_len, out_cap);
    std::memcpy(out, in, sizeof(float) * n);
    return n;
  }
  ResampleKernel k = build_kernel(orig_sr, new_sr);
  int64_t target = zvt_resample_out_len(in_len, orig_sr, new_sr);
  target = std::min(target, out_cap);
  // frame f covers input window starting at f*orig - width.
  int64_t written = 0;
  int64_t n_frames = (in_len + k.orig_freq - 1) / k.orig_freq;
  for (int64_t f = 0; f < n_frames && written < target; ++f) {
    int64_t base = f * k.orig_freq - k.width;
    for (int p = 0; p < k.new_freq && written < target; ++p) {
      const float* taps = &k.taps[static_cast<size_t>(p) * k.taps_per_phase];
      double acc = 0.0;
      for (int j = 0; j < k.taps_per_phase; ++j) {
        int64_t idx = base + j;
        if (idx >= 0 && idx < in_len) acc += (double)taps[j] * in[idx];
      }
      out[written++] = static_cast<float>(acc);
    }
  }
  return written;
}

// Number of STFT frames for the speaker mel frontend (center=true).
int64_t zvt_mel_frames(int64_t n_samples, int hop) {
  return n_samples / hop + 1;
}

// log-mel frontend (speaker encoder): 16 kHz mono in, 80 mel bins out,
// n_fft 512, win 400 (hann periodic, centered zero-pad to 512), hop 160,
// reflect-padded, power spectrum, HTK triangular mels (norm=None),
// log(mel + 1e-6), per-utterance mean subtraction over time.
// out must hold 80 * zvt_mel_frames(n, 160) floats (mel-major: [80][frames]).
void zvt_log_mel_16k(const float* wav, int64_t n, float* out) {
  const int n_fft = 512, win_len = 400, hop = 160, n_mels = 80;
  const int sr = 16000;
  const int n_freq = n_fft / 2 + 1;
  const int64_t frames = zvt_mel_frames(n, hop);

  // Window (periodic hann, centered in n_fft).
  std::vector<double> win(n_fft, 0.0);
  int ofs = (n_fft - win_len) / 2;
  for (int i = 0; i < win_len; ++i)
    win[ofs + i] = 0.5 * (1.0 - std::cos(2.0 * kPi * i / win_len));

  // Twiddles for radix-2 FFT of size 512.
  std::vector<double> cos_t(n_fft / 2), sin_t(n_fft / 2);
  for (int i = 0; i < n_fft / 2; ++i) {
    cos_t[i] = std::cos(-2.0 * kPi * i / n_fft);
    sin_t[i] = std::sin(-2.0 * kPi * i / n_fft);
  }

  // HTK mel filterbank [n_freq][n_mels].
  auto hz2mel = [](double f) { return 2595.0 * std::log10(1.0 + f / 700.0); };
  auto mel2hz = [](double m) { return 700.0 * (std::pow(10.0, m / 2595.0) - 1.0); };
  std::vector<double> f_pts(n_mels + 2);
  double mel_lo = hz2mel(0.0), mel_hi = hz2mel(sr / 2.0);
  for (int i = 0; i < n_mels + 2; ++i)
    f_pts[i] = mel2hz(mel_lo + (mel_hi - mel_lo) * i / (n_mels + 1));
  std::vector<float> fb(static_cast<size_t>(n_freq) * n_mels, 0.f);
  for (int f = 0; f < n_freq; ++f) {
    double freq = 0.5 * sr * f / (n_freq - 1);
    for (int m = 0; m < n_mels; ++m) {
      double down = (freq - f_pts[m]) / std::max(f_pts[m + 1] - f_pts[m], 1e-10);
      double up = (f_pts[m + 2] - freq) / std::max(f_pts[m + 2] - f_pts[m + 1], 1e-10);
      fb[static_cast<size_t>(f) * n_mels + m] =
          static_cast<float>(std::max(0.0, std::min(down, up)));
    }
  }

  const int pad = n_fft / 2;
  auto sample_at = [&](int64_t idx) -> double {
    // Reflect padding. Iterate: one reflection per side is not enough when
    // the clip is shorter than the pad (n <= 256), which previously read
    // out of bounds.
    int64_t i = idx - pad;
    if (n == 1) return wav[0];
    while (i < 0 || i >= n) {
      if (i < 0) i = -i;
      if (i >= n) i = 2 * (n - 1) - i;
    }
    return wav[i];
  };

  std::vector<double> re(n_fft), im(n_fft);
  std::vector<double> mel_sum(n_mels, 0.0);
  for (int64_t t = 0; t < frames; ++t) {
    // Load + window.
    for (int i = 0; i < n_fft; ++i) {
      re[i] = sample_at(t * hop + i) * win[i];
      im[i] = 0.0;
    }
    // In-place iterative radix-2 FFT (bit-reversal).
    for (int i = 1, j = 0; i < n_fft; ++i) {
      int bit = n_fft >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      if (i < j) { std::swap(re[i], re[j]); std::swap(im[i], im[j]); }
    }
    for (int len = 2; len <= n_fft; len <<= 1) {
      int step = n_fft / len;
      for (int i = 0; i < n_fft; i += len) {
        for (int j = 0; j < len / 2; ++j) {
          double wr = cos_t[static_cast<size_t>(j) * step];
          double wi = sin_t[static_cast<size_t>(j) * step];
          double ur = re[i + j], ui = im[i + j];
          double vr = re[i + j + len / 2] * wr - im[i + j + len / 2] * wi;
          double vi = re[i + j + len / 2] * wi + im[i + j + len / 2] * wr;
          re[i + j] = ur + vr; im[i + j] = ui + vi;
          re[i + j + len / 2] = ur - vr; im[i + j + len / 2] = ui - vi;
        }
      }
    }
    // Power -> mel -> log.
    for (int m = 0; m < n_mels; ++m) {
      double acc = 0.0;
      for (int f = 0; f < n_freq; ++f) {
        double p = re[f] * re[f] + im[f] * im[f];
        acc += p * fb[static_cast<size_t>(f) * n_mels + m];
      }
      double v = std::log(acc + 1e-6);
      out[static_cast<size_t>(m) * frames + t] = static_cast<float>(v);
      mel_sum[m] += v;
    }
  }
  // Per-utterance mean subtraction over time.
  for (int m = 0; m < n_mels; ++m) {
    float mean = static_cast<float>(mel_sum[m] / frames);
    for (int64_t t = 0; t < frames; ++t)
      out[static_cast<size_t>(m) * frames + t] -= mean;
  }
}

}  // extern "C"
