/*
	Differential-test helper: serialise the reference's ten-document
	unittest index with ANY jass_v1_codex tag and alignment, via the real
	serialise_jass_v1 / serialise_jass_v2 classes, into the cwd.  Lets
	tests/test_reference_differential.py byte-compare our writer for
	every codex the modern reference supports ('s','q','G','g','D'),
	not just the JASS_index CLI defaults ('G' v1 / 'g' v2).

	usage: serialise_tool <codex-char> <alignment> [2]
*/
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "serialise_jass_v1.h"
#include "serialise_jass_v2.h"
#include "index_manager_sequential.h"
#include "unittest_data.h"

int main(int argc, char **argv)
	{
	if (argc < 3)
		return fprintf(stderr, "usage: %s <codex-char> <alignment> [2]\n", argv[0]), 1;
	auto codex = static_cast<JASS::serialise_jass_v1::jass_v1_codex>(argv[1][0]);
	int8_t alignment = (int8_t)atoi(argv[2]);
	bool v2 = argc > 3 && strcmp(argv[3], "2") == 0;

	JASS::index_manager_sequential index;
	JASS::index_manager_sequential::unittest_build_index(index, JASS::unittest_data::ten_documents);

	if (v2)
		{
		JASS::serialise_jass_v2 serialiser(index.get_highest_document_id(), codex, alignment);
		index.iterate(serialiser);
		serialiser.finish();
		}
	else
		{
		JASS::serialise_jass_v1 serialiser(index.get_highest_document_id(), codex, alignment);
		index.iterate(serialiser);
		serialiser.finish();
		}
	return 0;
	}
