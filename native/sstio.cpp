// Native host-side audio runtime: fast 16-bit WAV codec + corpus scanning.
//
// The reference keeps its I/O in native code (util/wav.h via the cmd tools,
// the WASM heap-buffer binding in web/emscripten/main.cpp); this module is
// the TPU framework's equivalent: the host-side hot loops (PCM <-> planar
// float conversion, silence/peak scanning for corpus bucketing) in C++,
// exposed through the CPython C API (no pybind11 dependency).
//
// Build: `make -C native` (produces _sstio.so importable from the package);
// signalsmith_stretch_tpu.io falls back to pure Python when absent.
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct WavInfo {
	uint32_t channels = 0, rate = 0;
	const uint8_t *pcm = nullptr;  // 16-bit little-endian interleaved
	size_t frames = 0;
};

bool parseWav(const uint8_t *data, size_t len, WavInfo &info) {
	if (len < 44 || std::memcmp(data, "RIFF", 4) || std::memcmp(data + 8, "WAVE", 4)) {
		return false;
	}
	size_t pos = 12;
	uint16_t format = 0, bits = 0;
	while (pos + 8 <= len) {
		const char *tag = reinterpret_cast<const char *>(data + pos);
		uint32_t size;
		std::memcpy(&size, data + pos + 4, 4);
		pos += 8;
		if (pos + size > len) return false;
		if (!std::memcmp(tag, "fmt ", 4) && size >= 16) {
			std::memcpy(&format, data + pos, 2);
			uint16_t ch;
			std::memcpy(&ch, data + pos + 2, 2);
			info.channels = ch;
			std::memcpy(&info.rate, data + pos + 4, 4);
			std::memcpy(&bits, data + pos + 14, 2);
		} else if (!std::memcmp(tag, "data", 4)) {
			info.pcm = data + pos;
			info.frames = info.channels ? size / (2 * info.channels) : 0;
			break;
		}
		pos += size + (size & 1);
	}
	return format == 1 && bits == 16 && info.channels > 0 && info.pcm;
}

// decode_wav16(bytes) -> (channels:int, rate:int, planar_f32:bytes)
PyObject *decode_wav16(PyObject *, PyObject *arg) {
	Py_buffer buf;
	if (PyObject_GetBuffer(arg, &buf, PyBUF_SIMPLE) < 0) return nullptr;
	WavInfo info;
	bool ok = parseWav(static_cast<const uint8_t *>(buf.buf), size_t(buf.len), info);
	if (!ok) {
		PyBuffer_Release(&buf);
		PyErr_SetString(PyExc_ValueError, "not a 16-bit PCM WAV");
		return nullptr;
	}
	PyObject *out = PyBytes_FromStringAndSize(nullptr,
		Py_ssize_t(info.frames * info.channels * 4));
	if (!out) { PyBuffer_Release(&buf); return nullptr; }
	float *dst = reinterpret_cast<float *>(PyBytes_AS_STRING(out));
	const int16_t *src = reinterpret_cast<const int16_t *>(info.pcm);
	const float scale = 1.0f / 32768.0f;
	Py_BEGIN_ALLOW_THREADS
	for (uint32_t c = 0; c < info.channels; ++c) {
		float *d = dst + size_t(c) * info.frames;
		const int16_t *s = src + c;
		for (size_t i = 0; i < info.frames; ++i) {
			d[i] = float(s[i * info.channels]) * scale;
		}
	}
	Py_END_ALLOW_THREADS
	PyBuffer_Release(&buf);
	return Py_BuildValue("IIN", info.channels, info.rate, out);
}

// encode_wav16(planar_f32:bytes, channels:int, rate:int) -> bytes
PyObject *encode_wav16(PyObject *, PyObject *args) {
	Py_buffer buf;
	unsigned int channels, rate;
	if (!PyArg_ParseTuple(args, "y*II", &buf, &channels, &rate)) return nullptr;
	size_t total = size_t(buf.len) / 4;
	size_t frames = channels ? total / channels : 0;
	size_t dataSize = frames * channels * 2;
	PyObject *out = PyBytes_FromStringAndSize(nullptr, Py_ssize_t(44 + dataSize));
	if (!out) { PyBuffer_Release(&buf); return nullptr; }
	uint8_t *dst = reinterpret_cast<uint8_t *>(PyBytes_AS_STRING(out));
	auto putU32 = [&](size_t at, uint32_t v) { std::memcpy(dst + at, &v, 4); };
	auto putU16 = [&](size_t at, uint16_t v) { std::memcpy(dst + at, &v, 2); };
	std::memcpy(dst, "RIFF", 4);
	putU32(4, uint32_t(36 + dataSize));
	std::memcpy(dst + 8, "WAVEfmt ", 8);
	putU32(16, 16);
	putU16(20, 1);
	putU16(22, uint16_t(channels));
	putU32(24, rate);
	putU32(28, rate * channels * 2);
	putU16(32, uint16_t(channels * 2));
	putU16(34, 16);
	std::memcpy(dst + 36, "data", 4);
	putU32(40, uint32_t(dataSize));
	const float *src = reinterpret_cast<const float *>(buf.buf);
	int16_t *pcm = reinterpret_cast<int16_t *>(dst + 44);
	Py_BEGIN_ALLOW_THREADS
	for (uint32_t c = 0; c < channels; ++c) {
		const float *s = src + size_t(c) * frames;
		int16_t *d = pcm + c;
		for (size_t i = 0; i < frames; ++i) {
			float v = s[i];
			if (v > 1.0f) v = 1.0f;
			if (v < -1.0f) v = -1.0f;
			d[i * channels] = int16_t(v >= 0 ? v * 32767.0f + 0.5f
			                                 : v * 32768.0f - 0.5f);
		}
	}
	Py_END_ALLOW_THREADS
	PyBuffer_Release(&buf);
	return out;
}

// scan_stats(planar_f32:bytes, channels:int) -> (peak, rms, total_energy)
PyObject *scan_stats(PyObject *, PyObject *args) {
	Py_buffer buf;
	unsigned int channels;
	if (!PyArg_ParseTuple(args, "y*I", &buf, &channels)) return nullptr;
	size_t total = size_t(buf.len) / 4;
	const float *src = reinterpret_cast<const float *>(buf.buf);
	double sumSq = 0;
	float peak = 0;
	Py_BEGIN_ALLOW_THREADS
	for (size_t i = 0; i < total; ++i) {
		float v = src[i];
		float a = v < 0 ? -v : v;
		if (a > peak) peak = a;
		sumSq += double(v) * v;
	}
	Py_END_ALLOW_THREADS
	PyBuffer_Release(&buf);
	double rms = total ? std::sqrt(sumSq / double(total)) : 0.0;
	return Py_BuildValue("ddd", double(peak), rms, sumSq);
}

PyMethodDef methods[] = {
	{"decode_wav16", decode_wav16, METH_O,
	 "decode 16-bit PCM WAV bytes -> (channels, rate, planar float32 bytes)"},
	{"encode_wav16", encode_wav16, METH_VARARGS,
	 "encode planar float32 bytes -> 16-bit PCM WAV bytes"},
	{"scan_stats", scan_stats, METH_VARARGS,
	 "scan planar float32 -> (peak, rms, total_energy)"},
	{nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
	PyModuleDef_HEAD_INIT, "_sstio",
	"native audio I/O hot loops for signalsmith_stretch_tpu",
	-1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__sstio(void) {
	return PyModule_Create(&moduledef);
}
