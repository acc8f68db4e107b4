-- 4-byte selector → candidate function signatures (reference:
-- examples/ethereum_decoded_traces/create_evm_abi_decoding_dictionary.sql)
CREATE OR REPLACE TEMPORARY VIEW evm_abi_decoding AS
SELECT * FROM parquet.`{{.ABI_DICT_PATH}}`
