// Minimal 16-bit PCM WAV + headerless planar float32 I/O for the parity oracle.
// Written for this project (the reference's util/wav.h comes from an absent
// submodule, see /root/reference/.gitmodules).
#ifndef SST_ORACLE_WAV_H
#define SST_ORACLE_WAV_H

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

struct AudioBuffer {
	int channels = 0;
	int sampleRate = 48000;
	size_t offset = 0;                 // channel-view offset (mirrors util/wav.h usage)
	std::vector<std::vector<float>> data; // [channel][sample]

	size_t length() const { return channels ? data[0].size() : 0; }
	void resize(size_t samples) {
		data.resize(channels);
		for (auto &c : data) c.resize(samples, 0.0f);
	}
	float *operator[](int c) { return data[c].data() + offset; }
	const float *operator[](int c) const { return data[c].data() + offset; }
};

inline bool readWav(const std::string &path, AudioBuffer &out) {
	std::FILE *f = std::fopen(path.c_str(), "rb");
	if (!f) return false;
	auto readU32 = [&]() -> uint32_t {
		unsigned char b[4];
		if (std::fread(b, 1, 4, f) != 4) return 0;
		return uint32_t(b[0]) | (uint32_t(b[1]) << 8) | (uint32_t(b[2]) << 16) | (uint32_t(b[3]) << 24);
	};
	auto readU16 = [&]() -> uint16_t {
		unsigned char b[2];
		if (std::fread(b, 1, 2, f) != 2) return 0;
		return uint16_t(b[0]) | (uint16_t(b[1]) << 8);
	};
	char tag[5] = {0};
	if (std::fread(tag, 1, 4, f) != 4 || std::strcmp(tag, "RIFF")) { std::fclose(f); return false; }
	readU32();
	if (std::fread(tag, 1, 4, f) != 4 || std::strcmp(tag, "WAVE")) { std::fclose(f); return false; }
	uint16_t format = 0, channels = 0, bits = 0;
	uint32_t sampleRate = 0;
	bool gotData = false;
	std::vector<int16_t> pcm;
	while (!gotData && std::fread(tag, 1, 4, f) == 4) {
		uint32_t size = readU32();
		if (!std::strcmp(tag, "fmt ")) {
			format = readU16();
			channels = readU16();
			sampleRate = readU32();
			readU32(); readU16();
			bits = readU16();
			if (size > 16) std::fseek(f, long(size - 16), SEEK_CUR);
		} else if (!std::strcmp(tag, "data")) {
			pcm.resize(size/2);
			if (std::fread(pcm.data(), 2, pcm.size(), f) != pcm.size()) { std::fclose(f); return false; }
			gotData = true;
		} else {
			std::fseek(f, long(size + (size & 1)), SEEK_CUR);
		}
	}
	std::fclose(f);
	if (!gotData || format != 1 || bits != 16 || channels == 0) return false;
	out.channels = channels;
	out.sampleRate = int(sampleRate);
	size_t frames = pcm.size()/channels;
	out.data.assign(channels, std::vector<float>(frames));
	for (size_t i = 0; i < frames; ++i) {
		for (int c = 0; c < channels; ++c) {
			out.data[c][i] = float(pcm[i*channels + c])/32768.0f;
		}
	}
	return true;
}

inline bool writeWav(const std::string &path, const AudioBuffer &in) {
	std::FILE *f = std::fopen(path.c_str(), "wb");
	if (!f) return false;
	size_t frames = in.length();
	uint32_t dataSize = uint32_t(frames*in.channels*2);
	auto writeU32 = [&](uint32_t v) {
		unsigned char b[4] = {(unsigned char)(v), (unsigned char)(v >> 8), (unsigned char)(v >> 16), (unsigned char)(v >> 24)};
		std::fwrite(b, 1, 4, f);
	};
	auto writeU16 = [&](uint16_t v) {
		unsigned char b[2] = {(unsigned char)(v), (unsigned char)(v >> 8)};
		std::fwrite(b, 1, 2, f);
	};
	std::fwrite("RIFF", 1, 4, f);
	writeU32(36 + dataSize);
	std::fwrite("WAVE", 1, 4, f);
	std::fwrite("fmt ", 1, 4, f);
	writeU32(16);
	writeU16(1);
	writeU16(uint16_t(in.channels));
	writeU32(uint32_t(in.sampleRate));
	writeU32(uint32_t(in.sampleRate*in.channels*2));
	writeU16(uint16_t(in.channels*2));
	writeU16(16);
	std::fwrite("data", 1, 4, f);
	writeU32(dataSize);
	for (size_t i = 0; i < frames; ++i) {
		for (int c = 0; c < in.channels; ++c) {
			float s = in.data[c][i];
			if (s > 1) s = 1;
			if (s < -1) s = -1;
			int16_t v = int16_t(s >= 0 ? s*32767.0f + 0.5f : s*32768.0f - 0.5f);
			writeU16(uint16_t(v));
		}
	}
	std::fclose(f);
	return true;
}

// Headerless planar float32: [u32 channels][u32 sampleRate][u64 frames] then
// channels * frames float32 (channel-major).  Lossless path for parity tests.
inline bool readRaw(const std::string &path, AudioBuffer &out) {
	std::FILE *f = std::fopen(path.c_str(), "rb");
	if (!f) return false;
	uint32_t channels = 0, rate = 0;
	uint64_t frames = 0;
	if (std::fread(&channels, 4, 1, f) != 1 || std::fread(&rate, 4, 1, f) != 1
			|| std::fread(&frames, 8, 1, f) != 1) { std::fclose(f); return false; }
	out.channels = int(channels);
	out.sampleRate = int(rate);
	out.data.assign(channels, std::vector<float>(size_t(frames)));
	for (uint32_t c = 0; c < channels; ++c) {
		if (std::fread(out.data[c].data(), 4, size_t(frames), f) != size_t(frames)) {
			std::fclose(f);
			return false;
		}
	}
	std::fclose(f);
	return true;
}

inline bool writeRaw(const std::string &path, const AudioBuffer &in) {
	std::FILE *f = std::fopen(path.c_str(), "wb");
	if (!f) return false;
	uint32_t channels = uint32_t(in.channels), rate = uint32_t(in.sampleRate);
	uint64_t frames = in.length();
	std::fwrite(&channels, 4, 1, f);
	std::fwrite(&rate, 4, 1, f);
	std::fwrite(&frames, 8, 1, f);
	for (int c = 0; c < in.channels; ++c) {
		std::fwrite(in.data[c].data(), 4, size_t(frames), f);
	}
	std::fclose(f);
	return true;
}

#endif
