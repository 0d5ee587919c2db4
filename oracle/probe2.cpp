// Exact-grid probe: dumps the reference engine's per-block internals from a
// SINGLE exact() call, using the reference's own profiling macro hooks
// (signalsmith-stretch.h:329-331, 402-404) so the block grid and state carry
// are IDENTICAL to exact() — unlike probe.cpp, whose interval-chunked calls
// quantize block input positions differently whenever the main block grid is
// offset (outputLatency % interval != 0, i.e. any time factor != 1).
//
// The macros expand inside SignalsmithStretch::process(), so the hook function
// receives the engine by reference and reads members directly (public struct).
//
// Usage: probe2 in.raw out.raw probe_dump.bin [--time=] [--semitones=] ...
// Dump tags match probe.cpp (parse_dump in tests/test_probe_parity.py).
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <array>
#include <algorithm>
#include <functional>
#include <random>
#include <limits>
#include <type_traits>
#include <complex>
#include "signalsmith-linear/stft.h"

static std::FILE *g_dump = nullptr;
static bool g_block_ran = false;   // set when any step executed this sample
static bool g_enabled = false;     // only dump during the main process() call

template<class Stretch>
static void probeDumpState(Stretch &stretch);

#define SIGNALSMITH_STRETCH_PROFILE_PROCESS_STEP(step, steps) \
	do { g_block_ran = true; (void)(step); (void)(steps); } while (0)
#define SIGNALSMITH_STRETCH_PROFILE_PROCESS_ENDSTEP() \
	do { if (g_block_ran) { if (g_enabled) probeDumpState(*this); \
	     g_block_ran = false; } } while (0)

// test-tooling access hack, same as probe.cpp: the dump hook is a free
// function, so it needs the members visible
#define private public
#include "signalsmith-stretch.h"
#undef private

#include "wav.h"

using Stretch = signalsmith::stretch::SignalsmithStretch<float>;

template<typename T>
static void dumpArray(uint32_t tag, const T *data, size_t count) {
	uint32_t header[2] = {tag, uint32_t(count)};
	std::fwrite(header, 4, 2, g_dump);
	std::vector<float> flat(count);
	for (size_t i = 0; i < count; ++i) flat[i] = float(data[i]);
	std::fwrite(flat.data(), 4, count, g_dump);
}

template<class Stretch>
static void probeDumpState(Stretch &stretch) {
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
		std::vector<float> ie, outRe, outIm, prevRe, prevIm;
		for (auto &b : stretch.channelBands) {
			ie.push_back(b.inputEnergy);
			outRe.push_back(b.output.real());
			outIm.push_back(b.output.imag());
			prevRe.push_back(b.prevInput.real());
			prevIm.push_back(b.prevInput.imag());
		}
		dumpArray(8, ie.data(), ie.size());
		dumpArray(9, outRe.data(), outRe.size());
		dumpArray(10, outIm.data(), outIm.size());
		dumpArray(12, prevRe.data(), prevRe.size());
		dumpArray(13, prevIm.data(), prevIm.size());
	}
	dumpArray(11, &stretch.freqEstimateWeighted, 1);
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

	// exact() unrolled only enough to scope the dump to the main process():
	// outputSeek (pre-roll, dumps off) -> process (dumps ON) -> flush (off).
	// Mirrors signalsmith-stretch.h:467-491 exactly.
	float playbackRate = inputLength/float(outputLength);
	int seekLength = stretch.outputSeekLength(playbackRate);
	if (int(inputLength) < seekLength) return 1;
	stretch.outputSeek(in, seekLength);

	// NOTE: exactly the reference's arithmetic (signalsmith-stretch.h:484):
	// int = int - float  — the division stays float and the SUM truncates.
	// probe.cpp's `int(outputLength) - int(seekLength/playbackRate)` is one
	// output sample larger whenever seekLength/rate is fractional, which
	// shifts every block's input position formula.
	int outputIndex = int(outputLength) - seekLength/playbackRate;
	int mainIn = int(inputLength) - seekLength;
	in.offset = size_t(seekLength);
	g_enabled = true;
	stretch.process(in, mainIn, out, outputIndex);
	g_enabled = false;
	in.offset = 0;
	out.offset = size_t(outputIndex);
	stretch.flush(out, int(outputLength) - outputIndex, playbackRate);
	out.offset = 0;
	writeRaw(outPath, out);
	std::fclose(g_dump);
	return 0;
}
