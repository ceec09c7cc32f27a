// Native audio runtime: WAV codec, polyphase resampler, PCM conversion.
//
// C++ counterpart of the reference's Rust audio layer
// (crates/pocket-tts/src/audio.rs): the host-side hot loops around the TPU
// compute path.  Exposed as a C ABI consumed via ctypes
// (pocket_tts_tpu/native.py); the Python implementations remain as fallback
// and as the parity oracle for tests.
//
// The resampler reimplements scipy.signal.resample_poly's default design so
// outputs match the Python reference bit-closely: Kaiser(beta=5.0)-windowed
// sinc low-pass with half_len = 10*max(up,down), zero-stuffed polyphase
// convolution, and scipy's centered output trimming.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Modified Bessel function of the first kind, order zero (for the Kaiser
// window).  Power-series expansion; converges quickly for beta <= ~20.
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  const double half_x = x / 2.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half_x / k) * (half_x / k);
    sum += term;
    if (term < 1e-21 * sum) break;
  }
  return sum;
}

// scipy.signal.firwin(numtaps, cutoff, window=("kaiser", beta)) with
// fs=2 (cutoff as a fraction of Nyquist), scale=True.
std::vector<double> firwin_kaiser(int numtaps, double cutoff, double beta) {
  std::vector<double> h(numtaps);
  const double m = (numtaps - 1) / 2.0;
  const double i0b = bessel_i0(beta);
  for (int n = 0; n < numtaps; ++n) {
    const double t = n - m;
    // windowed sinc (cutoff in (0, 1), relative to Nyquist)
    const double sinc = (t == 0.0) ? cutoff
                                   : std::sin(M_PI * cutoff * t) / (M_PI * t);
    const double r = 2.0 * n / (numtaps - 1) - 1.0;  // [-1, 1]
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[n] = sinc * w;
  }
  // scale so the DC gain of the passband is exactly 1 (scipy scale=True:
  // evaluated at the band center, 0 for a low-pass)
  double dc = 0.0;
  for (double v : h) dc += v;
  for (double& v : h) v /= dc;
  return h;
}

int64_t gcd64(int64_t a, int64_t b) { return b == 0 ? a : gcd64(b, a % b); }

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// PCM conversion (audio.rs:110-146): float [-1,1] -> little-endian int16.
// ---------------------------------------------------------------------------
void pcm_f32_to_i16(const float* in, int64_t n, int16_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    // NaN passes both clamp comparisons; the cast below would be UB in C++
    // (Rust `as i16` and numpy define NaN -> 0, so match that explicitly)
    if (v != v) {
      out[i] = 0;
      continue;
    }
    v = v < -1.0f ? -1.0f : (v > 1.0f ? 1.0f : v);
    // truncation toward zero matches the references (torch .short(),
    // Rust `as i16`, numpy astype)
    out[i] = static_cast<int16_t>(v * 32767.0f);
  }
}

// Peak normalization (audio.rs:187-194).
void normalize_peak(float* data, int64_t n, float peak) {
  float m = 0.0f;
  for (int64_t i = 0; i < n; ++i) m = std::max(m, std::fabs(data[i]));
  if (m <= peak || m == 0.0f) return;
  const float g = peak / m;
  for (int64_t i = 0; i < n; ++i) data[i] *= g;
}

// ---------------------------------------------------------------------------
// Polyphase resampler (scipy resample_poly semantics; audio.rs:197-255).
// ---------------------------------------------------------------------------
int64_t resample_poly_out_len(int64_t n, int64_t from_rate, int64_t to_rate) {
  const int64_t g = gcd64(from_rate, to_rate);
  const int64_t up = to_rate / g, down = from_rate / g;
  return (n * up + down - 1) / down;  // ceil(n*up/down)
}

// Returns the number of output samples written (== resample_poly_out_len).
int64_t resample_poly(const float* in, int64_t n, int64_t from_rate,
                      int64_t to_rate, float* out) {
  const int64_t g = gcd64(from_rate, to_rate);
  const int64_t up = to_rate / g, down = from_rate / g;
  if (up == down) {
    std::memcpy(out, in, sizeof(float) * n);
    return n;
  }
  const int64_t max_rate = std::max(up, down);
  const int64_t half_len = 10 * max_rate;  // scipy default
  const double f_c = 1.0 / static_cast<double>(max_rate);  // rel. to Nyquist
  std::vector<double> h = firwin_kaiser(2 * half_len + 1, f_c, 5.0);
  for (double& v : h) v *= up;  // scipy multiplies the kernel by `up`

  // upfirdn(h, x, up, down) then trim scipy's edge offsets:
  // output index k corresponds to full-conv index k*down + half_len.
  const int64_t n_out = (n * up + down - 1) / down;
  const int64_t h_len = static_cast<int64_t>(h.size());
  for (int64_t k = 0; k < n_out; ++k) {
    const int64_t pos = k * down + half_len;  // index into zero-stuffed conv
    // y[pos] = sum_j h[j] * x_up[pos - j], x_up[m] = x[m/up] if m%up==0
    // solve (pos - j) % up == 0  =>  j ≡ pos (mod up)
    double acc = 0.0;
    int64_t j0 = pos % up;
    for (int64_t j = j0; j < h_len; j += up) {
      const int64_t m = (pos - j) / up;
      if (m >= 0 && m < n) acc += h[j] * in[m];
    }
    out[k] = static_cast<float>(acc);
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// WAV codec (16-bit PCM mono; audio.rs:22-185).  Minimal RIFF writer/parser
// tolerant of extra chunks and truncated data sections.
// ---------------------------------------------------------------------------
int64_t wav_encoded_size(int64_t n_samples) { return 44 + 2 * n_samples; }

void wav_encode(const float* samples, int64_t n, int32_t sample_rate,
                uint8_t* out) {
  const uint32_t data_bytes = static_cast<uint32_t>(2 * n);
  auto w32 = [&](int64_t off, uint32_t v) { std::memcpy(out + off, &v, 4); };
  auto w16 = [&](int64_t off, uint16_t v) { std::memcpy(out + off, &v, 2); };
  std::memcpy(out, "RIFF", 4);
  w32(4, 36 + data_bytes);
  std::memcpy(out + 8, "WAVE", 4);
  std::memcpy(out + 12, "fmt ", 4);
  w32(16, 16);
  w16(20, 1);  // PCM
  w16(22, 1);  // mono
  w32(24, sample_rate);
  w32(28, sample_rate * 2);
  w16(32, 2);
  w16(34, 16);
  std::memcpy(out + 36, "data", 4);
  w32(40, data_bytes);
  pcm_f32_to_i16(samples, n, reinterpret_cast<int16_t*>(out + 44));
}

}  // extern "C"
