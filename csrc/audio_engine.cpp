// Native audio engine for zonos_tpu: polyphase windowed-sinc resampler.
//
// Role parity: the reference's host-side audio path runs on torchaudio's
// C++ kernels (zonos/autoencoder.py:23, zonos/speaker_cloning.py:372-373).
// Here the hot host-side op — rational-rate resampling of speaker clips,
// prefix audio and outputs — is native C++, bound via ctypes
// (zonos_tpu/audio/native.py) with a scipy fallback.
//
// Filter design matches scipy.signal.resample_poly's default so the two
// paths are numerically interchangeable: Kaiser window (beta = 5.0),
// half-length 10 * max(up, down), cutoff 1 / max(up, down) of the
// upsampled Nyquist, gain `up`.  Accumulation in double, output float32.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Modified Bessel function of the first kind, order 0 (power series).
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= y / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

struct Filter {
  std::vector<double> taps;  // length 2*half+1
  long half;
};

Filter design_filter(int up, int down) {
  const double beta = 5.0;
  const long half = 10L * (up > down ? up : down);
  const long n_taps = 2 * half + 1;
  const double cutoff = 1.0 / static_cast<double>(up > down ? up : down);
  Filter f;
  f.half = half;
  f.taps.resize(n_taps);
  const double denom = bessel_i0(beta);
  double dc = 0.0;
  for (long i = 0; i < n_taps; ++i) {
    const double m = static_cast<double>(i - half);
    // sinc low-pass at `cutoff` (in units of the upsampled Nyquist)
    const double x = cutoff * m;
    const double sinc = (m == 0.0) ? 1.0 : std::sin(M_PI * x) / (M_PI * x);
    // Kaiser window
    const double r = m / static_cast<double>(half);
    const double w = bessel_i0(beta * std::sqrt(1.0 - r * r)) / denom;
    f.taps[i] = cutoff * sinc * w;
    dc += f.taps[i];
  }
  // firwin's scale=True: unity DC gain, then the polyphase gain `up`
  const double g = static_cast<double>(up) / dc;
  for (long i = 0; i < n_taps; ++i) f.taps[i] *= g;
  return f;
}

}  // namespace

extern "C" {

long zonos_resample_out_len(long n_in, int up, int down) {
  // matches scipy.signal.resample_poly: ceil(n_in * up / down)
  return (n_in * static_cast<long>(up) + down - 1) / down;
}

// in:  [channels][n_in] row-contiguous float32
// out: [channels][n_out] row-contiguous float32 (n_out from
//      zonos_resample_out_len)
// Returns 0 on success.
int zonos_resample(const float* in, long n_in, int channels, int up, int down,
                   float* out, long n_out) {
  if (up <= 0 || down <= 0 || n_in < 0 || channels <= 0) return 1;
  if (up == 1 && down == 1) {
    std::memcpy(out, in, sizeof(float) * static_cast<size_t>(n_in) * channels);
    return 0;
  }
  const Filter f = design_filter(up, down);
  const long half = f.half;

  for (int c = 0; c < channels; ++c) {
    const float* x = in + static_cast<long>(c) * n_in;
    float* y = out + static_cast<long>(c) * n_out;
    for (long m = 0; m < n_out; ++m) {
      // output m sits at upsampled-grid position p = m*down; the filter is
      // centered, so the tap index into h for input sample n is
      // k = p + half - n*up, valid when 0 <= k < 2*half+1.
      const long p = m * static_cast<long>(down) + half;
      // smallest n with k <= 2*half  ->  n >= (p - 2*half) / up
      long n0 = (p - 2 * half + up - 1) / static_cast<long>(up);
      if (n0 < 0) n0 = 0;
      // largest n with k >= 0  ->  n <= p / up
      long n1 = p / static_cast<long>(up);
      if (n1 >= n_in) n1 = n_in - 1;
      double acc = 0.0;
      for (long n = n0; n <= n1; ++n) {
        const long k = p - n * static_cast<long>(up);
        acc += f.taps[k] * static_cast<double>(x[n]);
      }
      y[m] = static_cast<float>(acc);
    }
  }
  return 0;
}

}  // extern "C"
