/*
	Differential-test helper for the LEGACY JASSv1 QMX family — the codecs
	behind the jass_v1_codex tags 'q' (QMX+D1), 'Q' (QMX-D4) and 'R'
	(QMX-D0), which the modern reference can no longer instantiate
	(serialise_jass_v1.cpp get_compressor exits on Q/R). Compiles the
	original ANT_compress_qmx / ANT_compress_qmx_d4 classes from
	/root/reference/JASSv1 and prints encoded hex, same protocol as
	refbuild_codec_tool.cpp.

	usage: legacy_qmx_tool qmx|qmx_d4 < ints-one-per-line > hex
*/
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <vector>
#include "compress_qmx.h"
#include "compress_qmx_d4.h"

int main(int argc, char **argv)
	{
	if (argc < 2)
		return fprintf(stderr, "usage: %s qmx|qmx_d4\n", argv[0]), 1;

	std::vector<uint32_t> source;
	char line[64];
	while (fgets(line, sizeof(line), stdin) != NULL)
		if (line[0] != '\n')
			source.push_back((uint32_t)strtoul(line, NULL, 10));

	std::vector<uint32_t> encoded(source.size() * 2 + (1 << 18));
	std::vector<uint32_t> decoded(source.size() + 1024);
	uint64_t nvalue = 0;

	if (strcmp(argv[1], "qmx_d4") == 0)
		{
		ANT_compress_qmx_d4 codec;
		codec.encodeArray(source.data(), source.size(), encoded.data(), &nvalue);
		codec.decodeArray(encoded.data(), nvalue, decoded.data(), source.size());
		}
	else
		{
		ANT_compress_qmx codec;
		codec.encodeArray(source.data(), source.size(), encoded.data(), &nvalue);
		codec.decodeArray(encoded.data(), nvalue, decoded.data(), source.size());
		}

	for (size_t i = 0; i < nvalue; i++)
		printf("%02x", reinterpret_cast<uint8_t *>(encoded.data())[i]);
	printf("\n");

	for (size_t i = 0; i < source.size(); i++)
		if (decoded[i] != source[i])
			return fprintf(stderr, "MISMATCH at %zu: %u != %u\n", i, decoded[i], source[i]), 2;
	return 0;
	}
