"""Build hooks: compile the optional native host-IO extension into the wheel.

The package is fully functional without the extension
(signalsmith_stretch_tpu.io falls back to pure Python), so a missing/broken
C toolchain degrades to a pure-Python wheel instead of failing the build —
the same optional-native pattern the reference uses for its WASM build
(the JS wrapper works without the compiled core for metadata-only paths).
"""
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as e:  # noqa: BLE001
            print(f"sstio native extension skipped ({e}); pure-Python wheel")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001
            print(f"sstio native extension skipped ({e}); pure-Python wheel")


setup(
    ext_modules=[
        Extension(
            "signalsmith_stretch_tpu._sstio",
            sources=["native/sstio.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
