// Stage-level probe: exposes the reference engine's internal per-block state
// (energy, smoothedEnergy, outputMap, prediction energies) for parity tests of
// the individual spectral stages.  Drives process() one interval per call so
// each call computes exactly one block, then dumps members.
//
// The `#define private public` is a test-tooling hack so the probe can read
// internals of the UNMODIFIED reference header; nothing here ships in the
// framework.
//
// Usage: probe in.raw out.raw probe_dump.bin [--time=] [--semitones=] ...
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
// pre-include every std header the reference pulls in (plus this repo's STFT)
// so the access hack below only affects the reference class itself
#include <array>
#include <algorithm>
#include <functional>
#include <random>
#include <limits>
#include <type_traits>
#include <complex>
#include "signalsmith-linear/stft.h"

#define private public
#include "signalsmith-stretch.h"
#undef private

#include "wav.h"

using Stretch = signalsmith::stretch::SignalsmithStretch<float>;

static std::FILE *g_dump = nullptr;

template<typename T>
static void dumpArray(uint32_t tag, const T *data, size_t count) {
	uint32_t header[2] = {tag, uint32_t(count)};
	std::fwrite(header, 4, 2, g_dump);
	std::vector<float> flat(count);
	for (size_t i = 0; i < count; ++i) flat[i] = float(data[i]);
	std::fwrite(flat.data(), 4, count, g_dump);
}

int main(int argc, char **argv) {
	double time = 1.0, semitones = 0, tonality = 0, formant = 0, formantBase = 0;
	bool formantComp = false, cheaper = true, split = false;
	long seed = 12345;
	std::string inPath, outPath, dumpPath;
	int nPos = 0;
	for (int i = 1; i < argc; ++i) {
		std::string a = argv[i];
		if (a.rfind("--time=", 0) == 0) time = std::atof(a.c_str() + 7);
		else if (a.rfind("--semitones=", 0) == 0) semitones = std::atof(a.c_str() + 12);
		else if (a.rfind("--tonality=", 0) == 0) tonality = std::atof(a.c_str() + 11);
		else if (a.rfind("--formant=", 0) == 0) formant = std::atof(a.c_str() + 10);
		else if (a.rfind("--formant-base=", 0) == 0) formantBase = std::atof(a.c_str() + 15);
		else if (a == "--formant-comp") formantComp = true;
		else if (a == "--default") cheaper = false;
		else if (a == "--split") split = true;
		else if (a.rfind("--seed=", 0) == 0) seed = std::atol(a.c_str() + 7);
		else if (nPos == 0) { inPath = a; ++nPos; }
		else if (nPos == 1) { outPath = a; ++nPos; }
		else { dumpPath = a; ++nPos; }
	}
	AudioBuffer in;
	if (!readRaw(inPath, in)) { std::fprintf(stderr, "read fail\n"); return 1; }
	g_dump = std::fopen(dumpPath.c_str(), "wb");

	Stretch stretch(seed);
	if (cheaper) stretch.presetCheaper(in.channels, float(in.sampleRate), split);
	else stretch.presetDefault(in.channels, float(in.sampleRate), split);
	stretch.setTransposeSemitones(float(semitones), float(tonality/in.sampleRate));
	stretch.setFormantSemitones(float(formant), formantComp);
	stretch.setFormantBase(float(formantBase/in.sampleRate));

	size_t inputLength = in.length();
	size_t outputLength = size_t(std::round(double(inputLength)*time));
	AudioBuffer out;
	out.channels = in.channels;
	out.sampleRate = in.sampleRate;
	out.resize(outputLength);

	// exact() unrolled with interval-chunked process calls so each chunk runs
	// exactly one block (mirrors signalsmith-stretch.h:467-491)
	float playbackRate = inputLength/float(outputLength);
	int seekLength = stretch.outputSeekLength(playbackRate);
	if (int(inputLength) < seekLength) return 1;
	stretch.outputSeek(in, seekLength);

	int H = stretch.intervalSamples();
	// same float semantics as exact() (signalsmith-stretch.h:484): int - float
	int outputIndex = int(outputLength) - seekLength/playbackRate;
	int mainIn = int(inputLength) - seekLength;

	int outDone = 0, inDone = 0;
	while (outDone < outputIndex) {
		int outChunk = std::min(H, outputIndex - outDone);
		long long inTarget = llround(double(outDone + outChunk)*double(mainIn)/double(outputIndex));
		int inChunk = int(inTarget) - inDone;
		in.offset = size_t(seekLength + inDone);
		out.offset = size_t(outDone);
		stretch.process(in, inChunk, out, outChunk);
		inDone += inChunk;
		outDone += outChunk;
		// per-block internals (valid for the block computed in this chunk)
		dumpArray(1, stretch.energy.data(), stretch.energy.size());
		dumpArray(2, stretch.smoothedEnergy.data(), stretch.smoothedEnergy.size());
		{
			std::vector<float> ib(stretch.outputMap.size()), fg(stretch.outputMap.size());
			for (size_t i = 0; i < stretch.outputMap.size(); ++i) {
				ib[i] = stretch.outputMap[i].inputBin;
				fg[i] = stretch.outputMap[i].freqGrad;
			}
			dumpArray(3, ib.data(), ib.size());
			dumpArray(4, fg.data(), fg.size());
		}
		{
			std::vector<float> pin, pout;
			for (auto &p : stretch.peaks) { pin.push_back(p.input); pout.push_back(p.output); }
			dumpArray(5, pin.data(), pin.size());
			dumpArray(6, pout.data(), pout.size());
		}
		{
			std::vector<float> pe;
			for (auto &p : stretch.channelPredictions) pe.push_back(p.energy);
			dumpArray(7, pe.data(), pe.size());
		}
		{
			std::vector<float> ie, outRe, outIm;
			for (auto &b : stretch.channelBands) {
				ie.push_back(b.inputEnergy);
				outRe.push_back(b.output.real());
				outIm.push_back(b.output.imag());
			}
			dumpArray(8, ie.data(), ie.size());
			dumpArray(9, outRe.data(), outRe.size());
			dumpArray(10, outIm.data(), outIm.size());
		}
		dumpArray(11, &stretch.freqEstimateWeighted, 1);
	}
	in.offset = 0;
	out.offset = size_t(outputIndex);
	stretch.flush(out, int(outputLength) - outputIndex, playbackRate);
	out.offset = 0;
	writeRaw(outPath, out);
	std::fclose(g_dump);
	return 0;
}
