-- per-batch buffer: the POSITIONAL ZIP of block.transactions with the
-- receipts array — reference: examples/ethereum_transactions/create_buffer.sql:161
-- ``ARRAY JOIN block.transactions AS tx, receipts AS r`` (ClickHouse zips
-- equal-length arrays by index). Spark mapping (SURVEY.md §2.4):
-- ``posexplode(arrays_zip(transactions, receipts))`` — NOT a cross join.
CREATE OR REPLACE TEMPORARY VIEW buffer_{{.START}}_{{.END}} AS
WITH deps AS (
    SELECT
        from_json(
            get_json_object(
                ethereum_rpc('eth_getBlockByNumber',
                             array(evm_hex_encode_int(id), 'true'),
                             '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'),
                '$.value'),
            'timestamp STRING, number STRING, hash STRING,
             transactions ARRAY<STRUCT<hash: STRING, transactionIndex: STRING,
                `from`: STRING, `to`: STRING, value: STRING, gas: STRING,
                gasPrice: STRING, nonce: STRING, input: STRING,
                type: STRING>>')                                  AS b,
        from_json(
            get_json_object(
                ethereum_rpc('eth_getBlockReceipts',
                             array(evm_hex_encode_int(id)),
                             '{{.RPC_ENDPOINT}}#fail-on-error=true&fail-on-null=true'),
                '$.value'),
            'ARRAY<STRUCT<transactionHash: STRING, transactionIndex: STRING,
                gasUsed: STRING, cumulativeGasUsed: STRING,
                effectiveGasPrice: STRING, status: STRING>>')     AS receipts
    FROM range({{.START}}, {{.END}} + 1)
),
zipped AS (
    SELECT b, z.transactions AS tx, z.receipts AS r
    FROM deps
    LATERAL VIEW posexplode(arrays_zip(b.transactions, receipts)) AS pos, z
)
SELECT
    timestamp_seconds(evm_hex_decode_int(b.timestamp, 'Int64'))  AS timestamp,
    evm_hex_decode(b.hash)                                       AS block_hash,
    evm_hex_decode_int(b.number, 'UInt64')                       AS block_number,
    evm_hex_decode(tx.hash)                                      AS hash,
    CAST(evm_hex_decode_int(tx.transactionIndex, 'UInt32') AS INT) AS transaction_index,
    evm_hex_decode(tx.`from`)                                    AS `from`,
    evm_hex_decode(tx.`to`)                                      AS `to`,
    evm_hex_decode_dec(tx.value)                                 AS value,
    evm_hex_decode_int(tx.gas, 'UInt64')                         AS gas,
    evm_hex_decode_int(r.gasUsed, 'UInt64')                      AS gas_used,
    evm_hex_decode_int(r.cumulativeGasUsed, 'UInt64')            AS cumulative_gas_used,
    evm_hex_decode_dec(r.effectiveGasPrice)                      AS effective_gas_price,
    evm_hex_decode_int(tx.nonce, 'UInt64')                       AS nonce,
    evm_hex_decode(tx.input)                                     AS input,
    CAST(evm_hex_decode_int(tx.type, 'UInt8') AS INT)            AS type,
    CAST(evm_hex_decode_int(r.status, 'UInt8') AS TINYINT)       AS status,
    date_format(timestamp_seconds(evm_hex_decode_int(b.timestamp, 'Int64')),
                'yyyyMM')                                        AS month
FROM zipped
