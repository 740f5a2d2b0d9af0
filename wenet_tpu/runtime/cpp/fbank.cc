// Kaldi-compatible fbank, native serving frontend.
//
// TPU-native rebuild of the reference C++ frontend
// (ref: runtime/core/frontend/fbank.h:34-130, fft.cc) with the exact
// pipeline of wenet_tpu/ops/fbank.py compute_fbank_np: remove-DC ->
// pre-emphasis (first sample duplicated) -> povey window -> zero-pad to
// next pow2 -> |FFT|^2 (nyquist bin dropped) -> kaldi mel banks
// (1127*ln(1+f/700), low 20 Hz) -> log with FLT_EPSILON floor.
// Caller passes int16-scaled floats (wave * 2^15), matching the
// reference's torchaudio convention.
//
// C ABI for ctypes; built by the Makefile into libfbank.so.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr float kLogFloor = 1.1920928955078125e-07f;  // FLT_EPSILON

int NextPow2(int n) {
  int p = 1;
  while (p < n) p <<= 1;
  return p;
}

// iterative radix-2 Cooley-Tukey, in-place on interleaved re/im
void Fft(std::vector<float>& re, std::vector<float>& im) {
  const int n = static_cast<int>(re.size());
  for (int i = 1, j = 0; i < n; ++i) {  // bit reversal
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * M_PI / len;
    const float wr = static_cast<float>(std::cos(ang));
    const float wi = static_cast<float>(std::sin(ang));
    for (int i = 0; i < n; i += len) {
      float cr = 1.0f, ci = 0.0f;
      for (int k = 0; k < len / 2; ++k) {
        const float ur = re[i + k], ui = im[i + k];
        const float vr = re[i + k + len / 2] * cr -
                         im[i + k + len / 2] * ci;
        const float vi = re[i + k + len / 2] * ci +
                         im[i + k + len / 2] * cr;
        re[i + k] = ur + vr;
        im[i + k] = ui + vi;
        re[i + k + len / 2] = ur - vr;
        im[i + k + len / 2] = ui - vi;
        const float ncr = cr * wr - ci * wi;
        ci = cr * wi + ci * wr;
        cr = ncr;
      }
    }
  }
}

inline float MelScale(float freq) {
  return 1127.0f * std::log1p(freq / 700.0f);
}

struct Fbank {
  int num_bins;
  int sample_rate;
  int frame_length;
  int frame_shift;
  int padded;
  float preemphasis = 0.97f;
  bool remove_dc = true;
  std::vector<float> window;                 // povey
  std::vector<std::vector<float>> mel;       // [bins][fft_bins]

  Fbank(int bins, int rate, float frame_len_ms, float frame_shift_ms)
      : num_bins(bins), sample_rate(rate) {
    frame_length = static_cast<int>(rate * frame_len_ms / 1000.0f);
    frame_shift = static_cast<int>(rate * frame_shift_ms / 1000.0f);
    padded = NextPow2(frame_length);
    // povey window: hann^0.85
    window.resize(frame_length);
    for (int i = 0; i < frame_length; ++i) {
      const double hann =
          0.5 - 0.5 * std::cos(2.0 * M_PI * i / (frame_length - 1));
      window[i] = static_cast<float>(std::pow(hann, 0.85));
    }
    // kaldi mel banks over padded/2 fft bins (nyquist dropped)
    const int fft_bins = padded / 2;
    const float low_freq = 20.0f;
    const float high_freq = 0.5f * rate;
    const float fft_bin_width = static_cast<float>(rate) / padded;
    const float mel_low = MelScale(low_freq);
    const float mel_high = MelScale(high_freq);
    const float mel_delta = (mel_high - mel_low) / (num_bins + 1);
    mel.assign(num_bins, std::vector<float>(fft_bins, 0.0f));
    for (int b = 0; b < num_bins; ++b) {
      const float left = mel_low + b * mel_delta;
      const float center = mel_low + (b + 1) * mel_delta;
      const float right = mel_low + (b + 2) * mel_delta;
      for (int i = 0; i < fft_bins; ++i) {
        const float m = MelScale(fft_bin_width * i);
        if (m > left && m < right) {
          mel[b][i] = m <= center ? (m - left) / (center - left)
                                  : (right - m) / (right - center);
        }
      }
    }
  }

  int NumFrames(int num_samples) const {
    if (num_samples < frame_length) return 0;
    return 1 + (num_samples - frame_length) / frame_shift;
  }

  // wav: int16-scaled float samples; out: [frames, num_bins]
  int Compute(const float* wav, int num_samples, float* out) const {
    const int T = NumFrames(num_samples);
    std::vector<float> re(padded), im(padded);
    std::vector<float> frame(frame_length);
    for (int t = 0; t < T; ++t) {
      const float* src = wav + static_cast<int64_t>(t) * frame_shift;
      std::memcpy(frame.data(), src, frame_length * sizeof(float));
      if (remove_dc) {
        double mean = 0.0;
        for (float v : frame) mean += v;
        mean /= frame_length;
        for (float& v : frame) v -= static_cast<float>(mean);
      }
      if (preemphasis != 0.0f) {
        for (int i = frame_length - 1; i > 0; --i)
          frame[i] -= preemphasis * frame[i - 1];
        frame[0] -= preemphasis * frame[0];
      }
      std::fill(re.begin(), re.end(), 0.0f);
      std::fill(im.begin(), im.end(), 0.0f);
      for (int i = 0; i < frame_length; ++i)
        re[i] = frame[i] * window[i];
      Fft(re, im);
      // power spectrum over first padded/2 bins
      float* dst = out + static_cast<int64_t>(t) * num_bins;
      for (int b = 0; b < num_bins; ++b) {
        double e = 0.0;
        const auto& w = mel[b];
        for (size_t i = 0; i < w.size(); ++i) {
          if (w[i] != 0.0f)
            e += w[i] * (re[i] * re[i] + im[i] * im[i]);
        }
        dst[b] = std::log(std::max(static_cast<float>(e), kLogFloor));
      }
    }
    return T;
  }
};

}  // namespace

extern "C" {

void* fbank_create(int num_bins, int sample_rate, float frame_len_ms,
                   float frame_shift_ms) {
  return new Fbank(num_bins, sample_rate, frame_len_ms, frame_shift_ms);
}

void fbank_destroy(void* h) { delete static_cast<Fbank*>(h); }

int fbank_num_frames(void* h, int num_samples) {
  return static_cast<Fbank*>(h)->NumFrames(num_samples);
}

int fbank_compute(void* h, const float* wav, int num_samples,
                  float* out) {
  return static_cast<Fbank*>(h)->Compute(wav, num_samples, out);
}

}  // extern "C"
