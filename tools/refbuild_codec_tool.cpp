/*
	Differential-test helper: encode/decode an integer sequence with any of
	the reference's codecs, by name, printing hex bytes. Links against the
	libJASS.a built by tools/build_reference.sh. Used by
	tests/test_reference_differential.py to generate byte-level goldens for
	the Python codec implementations in jassv2_spark/functions/.

	usage: codec_tool "<codec name>" < ints-one-per-line > hex
	       codec_tool "<codec name>" -d <count> < hex > ints-one-per-line
*/
#include <stdio.h>
#include <stdint.h>
#include <string.h>
#include <string>
#include <vector>
#include "compress_integer_all.h"

int main(int argc, char **argv)
	{
	if (argc < 2)
		return fprintf(stderr, "usage: %s <codec-name> [-d count]\n", argv[0]), 1;
	std::string name(argv[1]);
	auto codec = JASS::compress_integer_all::get_by_name(name);

	if (argc >= 4 && strcmp(argv[2], "-d") == 0)
		{
		size_t count = strtoull(argv[3], NULL, 10);
		std::vector<uint8_t> encoded;
		int hi, lo;
		while ((hi = getchar()) != EOF)
			{
			if (hi == '\n' || hi == ' ')
				continue;
			lo = getchar();
			char byte[3] = {(char)hi, (char)lo, 0};
			encoded.push_back((uint8_t)strtoul(byte, NULL, 16));
			}
		std::vector<JASS::compress_integer::integer> decoded(count + 1024);
		codec->decode(decoded.data(), count, encoded.data(), encoded.size());
		for (size_t i = 0; i < count; i++)
			printf("%u\n", decoded[i]);
		return 0;
		}

	std::vector<JASS::compress_integer::integer> source;
	char line[64];
	while (fgets(line, sizeof(line), stdin) != NULL)
		if (line[0] != '\n')
			source.push_back((JASS::compress_integer::integer)strtoul(line, NULL, 10));
	std::vector<uint8_t> encoded(source.size() * 8 + (1 << 20));
	size_t took = codec->encode(encoded.data(), encoded.size(), source.data(), source.size());
	for (size_t i = 0; i < took; i++)
		printf("%02x", encoded[i]);
	printf("\n");

	/* decode-verify so a golden is only emitted if the reference round-trips */
	std::vector<JASS::compress_integer::integer> decoded(source.size() + 1024);
	codec->decode(decoded.data(), source.size(), encoded.data(), took);
	for (size_t i = 0; i < source.size(); i++)
		if (decoded[i] != source[i])
			return fprintf(stderr, "MISMATCH at %zu: %u != %u\n", i, decoded[i], source[i]), 2;
	return 0;
	}
