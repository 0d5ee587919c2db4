// stft.h — clean-room implementation of the `signalsmith::linear::DynamicSTFT`
// interface consumed by /root/reference/signalsmith-stretch.h (which pulls the
// real implementation from the absent `signalsmith-linear` submodule, see
// /root/reference/CMakeLists.txt:6-14).
//
// This is NOT the upstream library: the upstream source is unavailable in this
// environment, so the semantics below are reconstructed from the call sites in
// signalsmith-stretch.h (every member used is tabulated in /root/repo/SURVEY.md
// §2.2).  Where the upstream behaviour is unrecoverable we define it explicitly:
//
//   * fftSamples() = next power of two >= blockSamples()   (upstream: ">= block")
//   * "modified" real FFT with half-bin offset: bin b has normalized frequency
//     (b + 0.5)/fftSamples, bands() = fftSamples/2 (no DC/Nyquist special cases;
//     matches the `DynamicSTFT<Sample, false, true>` template arg naming and the
//     homogeneous per-bin treatment in signalsmith-stretch.h:642-660).
//   * Kaiser analysis == synthesis window over blockSamples, beta chosen from the
//     overlap bandwidth B = blockSamples/interval as beta = pi*sqrt(B^2/4 - 1),
//     scaled so the average weighted-overlap-add (WOLA) weight is 1.
//   * analysisLatency() = blockSamples/2, synthesisLatency() = blockSamples -
//     blockSamples/2 (centred window; SURVEY.md §2.2 "≈block/2 each").
//   * reset(floor): clears all rings; `floor` is the minimum WOLA weight used
//     when normalizing output reads (guards the onset/tail where few windows
//     overlap), relative to the steady-state weight of 1.
//   * readOutput(...) always divides by max(accumulated weight, floor); as a
//     consequence finishOutput() needs no extra work and is a no-op.
//
// The JAX/TPU framework in /root/repo/signalsmith_stretch_tpu implements these
// exact semantics, so parity tests against the compiled reference+this-header
// binary exercise all of the (given) stretch logic plus one shared STFT spec.
#ifndef SIGNALSMITH_STRETCH_ORACLE_STFT_H
#define SIGNALSMITH_STRETCH_ORACLE_STFT_H

#include <cmath>
#include <complex>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

namespace signalsmith { namespace linear {

namespace _oracle_detail {

// Zeroth-order modified Bessel function of the first kind (series expansion).
inline double besselI0(double x) {
	double sum = 1, term = 1;
	double halfX = x*0.5;
	for (int k = 1; k < 64; ++k) {
		term *= (halfX/k)*(halfX/k);
		sum += term;
		if (term < sum*1e-18) break;
	}
	return sum;
}

// Iterative radix-2 complex FFT over power-of-2 sizes; twiddles in double,
// storage in Sample.  Performance is irrelevant (test oracle only).
template<typename Sample>
struct PowTwoFFT {
	using Complex = std::complex<Sample>;
	size_t size = 0;
	std::vector<size_t> bitrev;
	std::vector<Complex> twiddles; // per stage, concatenated

	void resize(size_t n) {
		size = n;
		bitrev.assign(n, 0);
		size_t bits = 0;
		while ((size_t(1) << bits) < n) ++bits;
		for (size_t i = 0; i < n; ++i) {
			size_t r = 0;
			for (size_t b = 0; b < bits; ++b) r |= ((i >> b) & 1) << (bits - 1 - b);
			bitrev[i] = r;
		}
		twiddles.clear();
		for (size_t len = 2; len <= n; len <<= 1) {
			for (size_t j = 0; j < len/2; ++j) {
				double angle = -2*M_PI*double(j)/double(len);
				twiddles.push_back(Complex(Sample(std::cos(angle)), Sample(std::sin(angle))));
			}
		}
	}

	// In-place forward FFT (negative exponent).  `inverse` conjugates twiddles
	// and scales by 1/N.
	void run(Complex *data, bool inverse) const {
		size_t n = size;
		for (size_t i = 0; i < n; ++i) {
			size_t r = bitrev[i];
			if (r > i) std::swap(data[i], data[r]);
		}
		size_t twiddleBase = 0;
		for (size_t len = 2; len <= n; len <<= 1) {
			size_t half = len/2;
			for (size_t start = 0; start < n; start += len) {
				for (size_t j = 0; j < half; ++j) {
					Complex w = twiddles[twiddleBase + j];
					if (inverse) w = std::conj(w);
					Complex a = data[start + j];
					Complex b = data[start + j + half]*w;
					data[start + j] = a + b;
					data[start + j + half] = a - b;
				}
			}
			twiddleBase += half;
		}
		if (inverse) {
			Sample scale = Sample(1)/Sample(n);
			for (size_t i = 0; i < n; ++i) data[i] *= scale;
		}
	}
};

// Optional intermediate-state dump for parity tests, enabled via the
// SST_ORACLE_DUMP environment variable (a directory path).  Records are
// appended to <dir>/records.bin as:
//   [u32 kind][u32 channels][u32 bands] then channels*bands*(re,im) float32
// kind: 0 = analysis spectrum, 1 = re-analysis (backOffset>0) spectrum,
//       2 = synthesis spectrum (what the stretch engine wrote back).
struct Dumper {
	std::FILE *file = nullptr;
	bool checked = false;
	void ensure() {
		if (checked) return;
		checked = true;
		const char *dir = std::getenv("SST_ORACLE_DUMP");
		if (dir && dir[0]) {
			std::string path = std::string(dir) + "/records.bin";
			file = std::fopen(path.c_str(), "wb");
		}
	}
	template<typename Sample>
	void record(uint32_t kind, uint32_t channels, uint32_t bands,
			const std::complex<Sample> *data, size_t channelStride) {
		ensure();
		if (!file) return;
		uint32_t header[3] = {kind, channels, bands};
		std::fwrite(header, sizeof(uint32_t), 3, file);
		std::vector<float> flat(size_t(channels)*bands*2);
		for (uint32_t c = 0; c < channels; ++c) {
			for (uint32_t b = 0; b < bands; ++b) {
				flat[(size_t(c)*bands + b)*2 + 0] = float(data[c*channelStride + b].real());
				flat[(size_t(c)*bands + b)*2 + 1] = float(data[c*channelStride + b].imag());
			}
		}
		std::fwrite(flat.data(), sizeof(float), flat.size(), file);
		std::fflush(file);
	}
};
inline Dumper &dumper() {
	static Dumper d;
	return d;
}

} // namespace _oracle_detail

template<typename Sample, bool SplitSupport=false, bool Modified=false>
struct DynamicSTFT {
	using Complex = std::complex<Sample>;

	enum WindowShape { kaiser = 0, acg = 1 };

	// ---- value-semantic ring states (stashed + swapped by the stretch core) --
	struct Input {
		std::vector<Sample> ring; // [channels][capacity]
		size_t pos = 0;           // write head (total samples written, unwrapped)
		void swap(Input &other) {
			ring.swap(other.ring);
			std::swap(pos, other.pos);
		}
	};
	struct Output {
		std::vector<Sample> ring;   // [channels][capacity]
		std::vector<Sample> weight; // [capacity], shared across channels
		size_t pos = 0;             // read head (unwrapped)
		void swap(Output &other) {
			ring.swap(other.ring);
			weight.swap(other.weight);
			std::swap(pos, other.pos);
		}
	};

	Input input;
	Output output;

	void configure(int inChannels, int outChannels, int blockSamples, int extraInputHistory=0) {
		_inChannels = inChannels;
		_outChannels = outChannels;
		_blockSamples = blockSamples;
		_fftSamples = 1;
		while (_fftSamples < size_t(blockSamples)) _fftSamples <<= 1;
		_bands = _fftSamples/2;

		_inputCapacity = size_t(blockSamples + extraInputHistory)*2 + 64;
		// Output readers look ahead by up to blockSamples (flush double-read of
		// the tail stays within one block).
		_outputCapacity = size_t(blockSamples)*2 + 64;

		input.ring.assign(_inputCapacity*_inChannels, 0);
		input.pos = 0;
		output.ring.assign(_outputCapacity*_outChannels, 0);
		output.weight.assign(_outputCapacity, 0);
		output.pos = 0;

		_spectrum.assign(size_t(_bands)*_outChannels, Complex(0));
		_timeBuffer.assign(_fftSamples, Complex(0));
		_analysisFrames.assign(_fftSamples*_inChannels, Complex(0));
		_fft.resize(_fftSamples);

		if (_interval == 0) _interval = blockSamples/4;
		makeWindow();
	}

	void setInterval(int interval, WindowShape shape=kaiser) {
		(void)shape; // only the Kaiser shape is implemented
		_interval = size_t(interval);
		makeWindow();
	}

	void reset(Sample weightFloor=Sample(0.1)) {
		_weightFloor = weightFloor;
		std::fill(input.ring.begin(), input.ring.end(), Sample(0));
		std::fill(output.ring.begin(), output.ring.end(), Sample(0));
		std::fill(output.weight.begin(), output.weight.end(), Sample(0));
		input.pos = 0;
		output.pos = 0;
		std::fill(_spectrum.begin(), _spectrum.end(), Complex(0));
	}

	// ---- geometry ----------------------------------------------------------
	size_t blockSamples() const { return size_t(_blockSamples); }
	size_t fftSamples() const { return _fftSamples; }
	size_t bands() const { return _bands; }
	size_t defaultInterval() const { return _interval; }
	size_t analysisLatency() const { return size_t(_blockSamples)/2; }
	size_t synthesisLatency() const { return size_t(_blockSamples) - size_t(_blockSamples)/2; }

	Sample binToFreq(Sample bin) const {
		return (bin + Sample(0.5))/Sample(_fftSamples);
	}
	Sample freqToBin(Sample freq) const {
		return freq*Sample(_fftSamples) - Sample(0.5);
	}

	// ---- input ring --------------------------------------------------------
	void writeInput(int channel, size_t length, const Sample *samples) {
		Sample *ring = input.ring.data() + size_t(channel)*_inputCapacity;
		for (size_t i = 0; i < length; ++i) {
			ring[(input.pos + i) % _inputCapacity] = samples[i];
		}
	}
	void moveInput(size_t length) {
		input.pos += length;
	}

	// ---- analysis ----------------------------------------------------------
	size_t analyseSteps() const { return 2; }
	void analyseStep(size_t step) { analyseStep(step, 0); }
	void analyseStep(size_t step, size_t backOffset) {
		if (step == 0) {
			// Window the latest block (ending `backOffset` samples before the
			// write head) and apply the half-bin modulation twist.
			_pendingBackOffset = backOffset;
			for (int c = 0; c < _inChannels; ++c) {
				const Sample *ring = input.ring.data() + size_t(c)*_inputCapacity;
				Complex *frame = _analysisFrames.data() + size_t(c)*_fftSamples;
				// frame start (unwrapped); input.pos >= block+backOffset is
				// guaranteed after configure() zero-fill... guard anyway.
				size_t start = input.pos >= size_t(_blockSamples) + backOffset
					? input.pos - size_t(_blockSamples) - backOffset : 0;
				for (size_t n = 0; n < size_t(_blockSamples); ++n) {
					Sample s = ring[(start + n) % _inputCapacity];
					Sample w = _window[n];
					frame[n] = _twist[n]*(s*w);
				}
				for (size_t n = size_t(_blockSamples); n < _fftSamples; ++n) frame[n] = Complex(0);
			}
		} else {
			for (int c = 0; c < _inChannels; ++c) {
				Complex *frame = _analysisFrames.data() + size_t(c)*_fftSamples;
				_fft.run(frame, false);
				Complex *spec = _spectrum.data() + size_t(c)*_bands;
				for (size_t b = 0; b < _bands; ++b) spec[b] = frame[b];
			}
			_oracle_detail::dumper().record<Sample>(
				_pendingBackOffset > 0 ? 1u : 0u,
				uint32_t(_inChannels), uint32_t(_bands), _spectrum.data(), _bands);
		}
	}

	Complex *spectrum(int channel) {
		return _spectrum.data() + size_t(channel)*_bands;
	}

	// ---- synthesis ---------------------------------------------------------
	size_t synthesiseSteps() const { return 2; }
	void synthesiseStep(size_t step) {
		if (step == 0) {
			_oracle_detail::dumper().record<Sample>(
				2u, uint32_t(_outChannels), uint32_t(_bands), _spectrum.data(), _bands);
			_synthFrames.assign(_fftSamples*_outChannels, Sample(0));
			for (int c = 0; c < _outChannels; ++c) {
				Complex *buf = _timeBuffer.data();
				const Complex *spec = _spectrum.data() + size_t(c)*_bands;
				for (size_t b = 0; b < _bands; ++b) buf[b] = spec[b];
				for (size_t b = _bands; b < _fftSamples; ++b) buf[b] = Complex(0);
				_fft.run(buf, true);
				Sample *frame = _synthFrames.data() + size_t(c)*_fftSamples;
				for (size_t n = 0; n < _fftSamples; ++n) {
					// y[n] = 2*Re(u[n]*conj(twist[n])); _twist = e^{-i pi n / N}
					frame[n] = 2*(buf[n].real()*_twist[n].real() + buf[n].imag()*_twist[n].imag());
				}
			}
		} else {
			// Weighted overlap-add into the output ring at the read head.
			for (int c = 0; c < _outChannels; ++c) {
				Sample *ring = output.ring.data() + size_t(c)*_outputCapacity;
				const Sample *frame = _synthFrames.data() + size_t(c)*_fftSamples;
				for (size_t n = 0; n < size_t(_blockSamples); ++n) {
					ring[(output.pos + n) % _outputCapacity] += _window[n]*frame[n];
				}
			}
			for (size_t n = 0; n < size_t(_blockSamples); ++n) {
				output.weight[(output.pos + n) % _outputCapacity] += _window[n]*_window[n];
			}
		}
	}

	// ---- output ring -------------------------------------------------------
	void readOutput(int channel, size_t length, Sample *samples) {
		readOutput(channel, 0, length, samples);
	}
	void readOutput(int channel, size_t offset, size_t length, Sample *samples) {
		const Sample *ring = output.ring.data() + size_t(channel)*_outputCapacity;
		for (size_t i = 0; i < length; ++i) {
			size_t idx = (output.pos + offset + i) % _outputCapacity;
			Sample w = output.weight[idx];
			if (w < _weightFloor) w = _weightFloor;
			samples[i] = ring[idx]/w;
		}
	}
	void addOutput(int channel, size_t length, const Sample *samples) {
		Sample *ring = output.ring.data() + size_t(channel)*_outputCapacity;
		for (size_t i = 0; i < length; ++i) {
			ring[(output.pos + i) % _outputCapacity] += samples[i];
		}
	}
	void moveOutput(size_t length) {
		// Zero consumed slots so the ring can wrap cleanly.
		for (size_t i = 0; i < length; ++i) {
			size_t idx = (output.pos + i) % _outputCapacity;
			for (int c = 0; c < _outChannels; ++c) {
				output.ring[size_t(c)*_outputCapacity + idx] = 0;
			}
			output.weight[idx] = 0;
		}
		output.pos += length;
	}
	void finishOutput(Sample /*strength*/=1) {
		// No-op: readOutput always normalizes by the accumulated WOLA weight
		// (clamped below by the reset() floor), so no finalization is needed.
	}

private:
	int _inChannels = 0, _outChannels = 0;
	int _blockSamples = 0;
	size_t _fftSamples = 0, _bands = 0, _interval = 0;
	size_t _inputCapacity = 0, _outputCapacity = 0;
	Sample _weightFloor = Sample(0.1);
	size_t _pendingBackOffset = 0;

	std::vector<Sample> _window;   // Kaiser, scaled so mean WOLA weight == 1
	std::vector<Complex> _twist;   // e^{-i pi n / fftSamples}
	std::vector<Complex> _spectrum;
	std::vector<Complex> _timeBuffer;
	std::vector<Complex> _analysisFrames;
	std::vector<Sample> _synthFrames;
	_oracle_detail::PowTwoFFT<Sample> _fft;

	void makeWindow() {
		if (_blockSamples <= 0) return;
		size_t N = size_t(_blockSamples);
		double B = double(_blockSamples)/double(_interval ? _interval : 1);
		if (B < 2) B = 2;
		double beta = M_PI*std::sqrt(B*B*0.25 - 1);
		double i0beta = _oracle_detail::besselI0(beta);
		_window.assign(N, 0);
		double sumSq = 0;
		for (size_t n = 0; n < N; ++n) {
			double r = (2.0*(double(n) + 0.5) - double(N))/double(N);
			double w = _oracle_detail::besselI0(beta*std::sqrt(std::max(0.0, 1 - r*r)))/i0beta;
			_window[n] = Sample(w);
			sumSq += w*w;
		}
		// Average WOLA weight = sum(w^2)/interval; scale so it becomes 1.
		double scale = std::sqrt(double(_interval)/sumSq);
		for (auto &w : _window) w = Sample(w*scale);

		_twist.assign(_fftSamples, Complex(0));
		for (size_t n = 0; n < _fftSamples; ++n) {
			double angle = -M_PI*double(n)/double(_fftSamples);
			_twist[n] = Complex(Sample(std::cos(angle)), Sample(std::sin(angle)));
		}
	}
};

}} // namespace signalsmith::linear

#endif
