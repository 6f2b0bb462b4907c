// diffsvc_tpu native runtime: host-side hot loops for the data/IO path.
//
// The TPU compute path is JAX/XLA; these are the *host* kernels the
// reference delegated to scipy/numba C extensions (SURVEY.md §2.9):
//   - sliding-window maximum / RMS (the silence slicer's inner loops,
//     reference infer_tools/slicer.py:20-27),
//   - uniform mel2ph alignment (process_pipeline.py:95-107),
//   - f0 -> coarse mel-scale bins (utils/pitch_utils.py:17-31),
//   - int16 -> float32 waveform conversion.
//
// Built as a plain shared library, bound with ctypes (no pybind11).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

extern "C" {

// Sliding-window maximum over |arr| with window `win`, truncated to the
// "valid" region exactly like scipy maximum_filter1d + the slicer's slice:
// out length = n - win + 1, out[i] = max(arr[i .. i+win-1]).
void window_maximum(const float* arr, int64_t n, int64_t win, float* out) {
    std::deque<int64_t> dq;
    for (int64_t i = 0; i < n; ++i) {
        while (!dq.empty() && arr[dq.back()] <= arr[i]) dq.pop_back();
        dq.push_back(i);
        if (dq.front() <= i - win) dq.pop_front();
        if (i >= win - 1) out[i - win + 1] = arr[dq.front()];
    }
}

// Sliding-window RMS with uniform_filter1d semantics (reflect-padded mean
// of x^2 minus squared mean), truncated to the valid region:
// out length = n - win + 1.
void window_rms(const float* arr, int64_t n, int64_t win, float* out) {
    // uniform_filter1d(x, win) at position i averages
    // x[i - win/2 .. i - win/2 + win - 1] with reflect ('reflect') padding.
    // The slicer then takes indices [win/2 .. win/2 + n - win], i.e. the
    // fully-valid centres — so plain running sums over the interior suffice.
    std::vector<double> p1(n + 1, 0.0), p2(n + 1, 0.0);
    for (int64_t i = 0; i < n; ++i) {
        p1[i + 1] = p1[i] + arr[i];
        p2[i + 1] = p2[i] + double(arr[i]) * arr[i];
    }
    const double inv = 1.0 / double(win);
    for (int64_t i = 0; i + win <= n; ++i) {
        double mean = (p1[i + win] - p1[i]) * inv;
        double mean_sq = (p2[i + win] - p2[i]) * inv;
        double var = mean_sq - mean * mean;
        out[i] = float(std::sqrt(var > 0.0 ? var : 0.0));
    }
}

// Uniform stretch alignment: mel2ph[start..end] = i_ph + 1 per unit frame
// (reference get_align semantics, incl. the end_frame+1 overlap).
void align_uniform(int64_t mel_len, int64_t n_units, int32_t* mel2ph) {
    std::memset(mel2ph, 0, sizeof(int32_t) * mel_len);
    double ph_durs = double(mel_len) / double(n_units);
    int64_t start_frame = 0;
    for (int64_t i = 0; i < n_units; ++i) {
        int64_t end_frame = int64_t(i * ph_durs + ph_durs + 0.5);
        for (int64_t f = start_frame; f <= end_frame && f < mel_len; ++f)
            mel2ph[f] = int32_t(i + 1);
        start_frame = end_frame + 1;
    }
}

// f0 (Hz) -> coarse mel-scale bins [1, f0_bin-1]; 0 Hz -> 1.
void f0_to_coarse(const float* f0, int64_t n, int32_t f0_bin, float f0_min,
                  float f0_max, int32_t* out) {
    const double mel_min = 1127.0 * std::log(1.0 + f0_min / 700.0);
    const double mel_max = 1127.0 * std::log(1.0 + f0_max / 700.0);
    const double scale = (f0_bin - 2) / (mel_max - mel_min);
    for (int64_t i = 0; i < n; ++i) {
        double mel = 1127.0 * std::log(1.0 + double(f0[i]) / 700.0);
        if (mel > 0.0) mel = (mel - mel_min) * scale + 1.0;
        if (mel <= 1.0) mel = 1.0;
        if (mel > f0_bin - 1) mel = f0_bin - 1;
        // np.rint parity: round half to EVEN (lround rounds
        // half away from zero and diverges at x.5 bins)
        out[i] = int32_t(std::rint(mel));
    }
}

// int16 PCM -> float32 in [-1, 1).
void pcm16_to_float(const int16_t* in, int64_t n, float* out) {
    const float s = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * s;
}

}  // extern "C"
