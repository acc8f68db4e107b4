-- ABI decoding dictionary: selector (0x-hex topic0) → candidate fullsigs
-- (reference: examples/ethereum_decoded_logs/create_evm_abi_decoding_dictionary.sql:1-8;
-- LIFETIME refresh is sources.dictionary.RefreshableDictionary — here the
-- dictionary is a parquet-backed view, broadcast into the decode join)
CREATE OR REPLACE TEMPORARY VIEW evm_abi_decoding AS
SELECT * FROM parquet.`{{.ABI_DICT_PATH}}`
