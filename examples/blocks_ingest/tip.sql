-- chain head from the RPC endpoint (reference:
-- examples/ethereum_blocks/tip.sql:1-8; LATEST_BLOCK_STATUS handling is
-- the mock's concern here)
SELECT evm_hex_decode_int(
           get_json_object(
               ethereum_rpc('eth_blockNumber', array(),
                            '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'),
               '$.value'),
           'UInt64') AS tip
