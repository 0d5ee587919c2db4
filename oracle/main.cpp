// Parity oracle CLI: drives the UNMODIFIED reference header
// (/root/reference/signalsmith-stretch.h, mounted read-only and included via
// -I) on top of this repo's clean-room DynamicSTFT (signalsmith-linear/stft.h).
// The binary renders golden outputs for the TPU framework's regression tests.
//
// Usage:
//   oracle in.(wav|raw) out.(wav|raw) [--time=1.0] [--semitones=0]
//     [--tonality=8000] [--formant=0] [--formant-comp] [--formant-base=0]
//     [--cheaper] [--split] [--seed=12345] [--mode=exact|staged|stream]
//     [--chunk=512] [--raw] [--info]
//
// Modes mirror the reference's documented API recipes:
//   exact  — SignalsmithStretch::exact()            (signalsmith-stretch.h:468)
//   staged — outputSeek → process → flush           (cmd/main.cpp:56-83)
//   stream — seek(inputLatency) → chunked process → flush (cmd/main-dev.cpp:143-152)
#include <cmath>
#include <cstdio>
#include <cstring>
#include <string>

#include "signalsmith-stretch.h"
#include "wav.h"

using Stretch = signalsmith::stretch::SignalsmithStretch<float>;

struct Args {
	std::string positional[2];
	int nPositional = 0;
	double time = 1.0, semitones = 0, tonality = 8000, formant = 0, formantBase = 0;
	bool formantComp = false, cheaper = false, split = false, raw = false, info = false;
	long seed = 12345;
	std::string mode = "exact";
	int chunk = 512;
	int blockSamples = 0, intervalSamples = 0;  // manual configure() override

	bool parse(int argc, char **argv) {
		for (int i = 1; i < argc; ++i) {
			std::string a = argv[i];
			auto num = [&](const char *name) -> double {
				return std::atof(a.c_str() + std::strlen(name) + 3);
			};
			if (a.rfind("--time=", 0) == 0) time = num("time");
			else if (a.rfind("--semitones=", 0) == 0) semitones = num("semitones");
			else if (a.rfind("--tonality=", 0) == 0) tonality = num("tonality");
			else if (a.rfind("--formant=", 0) == 0) formant = num("formant");
			else if (a.rfind("--formant-base=", 0) == 0) formantBase = num("formant-base");
			else if (a == "--formant-comp") formantComp = true;
			else if (a == "--cheaper") cheaper = true;
			else if (a == "--split") split = true;
			else if (a == "--raw") raw = true;
			else if (a == "--info") info = true;
			else if (a.rfind("--seed=", 0) == 0) seed = std::atol(a.c_str() + 7);
			else if (a.rfind("--chunk=", 0) == 0) chunk = std::atoi(a.c_str() + 8);
			else if (a.rfind("--block=", 0) == 0) blockSamples = std::atoi(a.c_str() + 8);
			else if (a.rfind("--interval=", 0) == 0) intervalSamples = std::atoi(a.c_str() + 11);
			else if (a.rfind("--mode=", 0) == 0) mode = a.substr(7);
			else if (a.rfind("--", 0) == 0) { std::fprintf(stderr, "unknown flag %s\n", a.c_str()); return false; }
			else if (nPositional < 2) positional[nPositional++] = a;
			else return false;
		}
		return nPositional == 2 || info;
	}
};

int main(int argc, char **argv) {
	Args args;
	if (!args.parse(argc, argv)) {
		std::fprintf(stderr, "usage: oracle in out [--time=] [--semitones=] [--mode=exact|staged|stream] ...\n");
		return 1;
	}

	AudioBuffer in;
	int sampleRate = 48000, channels = 2;
	if (args.nPositional == 2) {
		bool ok = args.raw ? readRaw(args.positional[0], in) : readWav(args.positional[0], in);
		if (!ok) { std::fprintf(stderr, "failed to read %s\n", args.positional[0].c_str()); return 1; }
		sampleRate = in.sampleRate;
		channels = in.channels;
	}

	Stretch stretch(args.seed);
	if (args.blockSamples > 0 && args.intervalSamples > 0) {
		stretch.configure(channels, args.blockSamples, args.intervalSamples, args.split);
	} else if (args.cheaper) {
		stretch.presetCheaper(channels, float(sampleRate), args.split);
	} else {
		stretch.presetDefault(channels, float(sampleRate), args.split);
	}
	stretch.setTransposeSemitones(float(args.semitones), float(args.tonality/sampleRate));
	stretch.setFormantSemitones(float(args.formant), args.formantComp);
	stretch.setFormantBase(float(args.formantBase/sampleRate));

	if (args.info) {
		std::printf("{\"blockSamples\": %d, \"intervalSamples\": %d, \"inputLatency\": %d, "
			"\"outputLatency\": %d, \"seekLength\": %d, \"outputSeekLength\": %d, \"version\": \"%zu.%zu.%zu\"}\n",
			stretch.blockSamples(), stretch.intervalSamples(), stretch.inputLatency(),
			stretch.outputLatency(), stretch.seekLength(),
			stretch.outputSeekLength(float(1.0/args.time)),
			Stretch::version[0], Stretch::version[1], Stretch::version[2]);
		if (args.nPositional < 2) return 0;
	}

	size_t inputLength = in.length();
	size_t outputLength = size_t(std::round(double(inputLength)*args.time));

	AudioBuffer out;
	out.channels = channels;
	out.sampleRate = sampleRate;

	if (args.mode == "exact") {
		out.resize(outputLength);
		stretch.exact(in, int(inputLength), out, int(outputLength));
	} else if (args.mode == "staged") {
		// The documented offline recipe (cmd/main.cpp:56-83): outputSeek so the
		// first output sample aligns with the start of the input, process up to
		// one interval before the end, then flush.
		out.resize(outputLength);
		auto seekLength = stretch.outputSeekLength(float(1.0/args.time));
		stretch.outputSeek(in, seekLength);
		int outputIndex = int(outputLength) - stretch.intervalSamples();
		int outputPos = outputIndex + stretch.outputLatency();
		int inputPos = int(std::round(outputPos/args.time));
		int inputIndex = inputPos + stretch.inputLatency();
		in.resize(size_t(inputIndex > int(inputLength) ? inputIndex : int(inputLength)));
		in.offset = size_t(seekLength);
		stretch.process(in, inputIndex - seekLength, out, outputIndex);
		in.offset = 0;
		out.offset = size_t(outputIndex);
		stretch.flush(out, int(outputLength) - outputIndex);
		out.offset = 0;
	} else if (args.mode == "stream") {
		// Streaming recipe (cmd/main-dev.cpp:143-152) with chunked process()
		// calls to exercise call-splitting invariance.
		size_t padIn = inputLength + size_t(stretch.inputLatency());
		in.resize(padIn);
		int tailSamples = stretch.outputLatency() + stretch.inputLatency();
		out.resize(outputLength + size_t(tailSamples));
		stretch.seek(in, stretch.inputLatency(), 1.0/args.time);
		in.offset = size_t(stretch.inputLatency());
		size_t outDone = 0, inDone = 0;
		while (outDone < outputLength) {
			size_t outChunk = std::min<size_t>(size_t(args.chunk), outputLength - outDone);
			size_t inTarget = size_t(std::llround(double(outDone + outChunk)*double(inputLength)/double(outputLength)));
			if (inTarget > inputLength) inTarget = inputLength;
			size_t inChunk = inTarget - inDone;
			in.offset = size_t(stretch.inputLatency()) + inDone;
			out.offset = outDone;
			stretch.process(in, int(inChunk), out, int(outChunk));
			inDone += inChunk;
			outDone += outChunk;
		}
		out.offset = outputLength;
		stretch.flush(out, tailSamples);
		in.offset = 0;
		out.offset = 0;
	} else {
		std::fprintf(stderr, "unknown mode %s\n", args.mode.c_str());
		return 1;
	}

	bool ok = args.raw ? writeRaw(args.positional[1], out) : writeWav(args.positional[1], out);
	if (!ok) { std::fprintf(stderr, "failed to write %s\n", args.positional[1].c_str()); return 1; }
	return 0;
}
